from .mesh import (create_mesh, batch_sharding, replicated_sharding,  # noqa: F401
                   shard_batch, pad_to_multiple)
from .tp import (create_mesh_2d, set_tp_mesh, get_tp,  # noqa: F401
                 tp_shardings, shard_state_tp)
from .multihost import (initialize as multihost_initialize,  # noqa: F401
                        is_primary, is_multiprocess, put_global,
                        replicate_global)
