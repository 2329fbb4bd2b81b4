from .mesh import (create_mesh, batch_sharding, replicated_sharding,  # noqa: F401
                   shard_batch, pad_to_multiple)
