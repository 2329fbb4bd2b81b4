"""Train state: joint (nerf, crf) parameter tree + optimizer state.

The reference keeps NeRFAll and the CRF as separate torch modules sharing
one Adam (ref: run_nerf.py:242-274); here both parameter trees live in one
pytree so a single ``optax`` update and a single checkpoint cover them.
"""

from __future__ import annotations

from typing import Any

import flax.struct
import jax
import jax.numpy as jnp
import optax


@flax.struct.dataclass
class TrainState:
    step: jnp.ndarray
    params: Any                 # {"nerf": ..., "crf": ...}
    batch_stats: Any            # AWP BatchNorm running stats ({} if unused)
    opt_state: Any

    def apply_gradients(self, tx: optax.GradientTransformation, grads,
                        new_batch_stats=None):
        updates, new_opt = tx.update(grads, self.opt_state, self.params)
        new_params = optax.apply_updates(self.params, updates)
        return self.replace(
            step=self.step + 1, params=new_params, opt_state=new_opt,
            batch_stats=(new_batch_stats if new_batch_stats is not None
                         else self.batch_stats))


def create_train_state(model, crf_module, tx, key, sample_rays,
                       sample_rays_info, crf_identity_prefit: bool = False,
                       crf_prefit_steps: int = 3000) -> TrainState:
    """Initialize all parameters by tracing the richest forward path.

    ``sample_rays``/``sample_rays_info``: small representative inputs (shape
    only matters). When the kernel is configured, init runs the kernel path
    so every submodule materializes.
    """
    from ..models.tonemapping import CRF, crf_init_identity

    k_nerf, k_crf, k_fit, k_call = jax.random.split(key, 4)
    force_naive = model.kcfg.kernel_type == "none"
    # jit the init trace: on remote backends (axon tunnel) an un-jitted init
    # dispatches hundreds of tiny eager ops, each paying a compile RPC —
    # measured many MINUTES of startup; as one jitted program it is seconds
    init_fn = jax.jit(model.init,
                      static_argnames=("force_naive", "return_pts0_rgb"))
    variables = init_fn(k_nerf, k_call, jnp.asarray(sample_rays),
                        jax.tree_util.tree_map(jnp.asarray, sample_rays_info),
                        force_naive=force_naive, return_pts0_rgb=True)
    nerf_params = variables["params"]
    batch_stats = variables.get("batch_stats", {})

    crf_vars = jax.jit(crf_module.init, static_argnames=("mode",))(
        k_crf, jnp.zeros((4, 3)), mode="init_all")
    crf_params = dict(crf_vars.get("params", {}))
    if crf_identity_prefit:
        # jitted lax.scan identity pre-fit (ref: tonemapping.py:29-57);
        # standalone CRF instances rebuilt from static config (setup-bound
        # submodules are not reachable outside apply)
        subs = {
            "tonemapping_rgb": CRF(crf_module.map_type_rgb,
                                   crf_module.gamma,
                                   crf_module.extra_features_rgb),
            "tonemapping_event": CRF(crf_module.map_type_event,
                                     crf_module.gamma,
                                     crf_module.extra_features_event),
        }
        for name, sub in subs.items():
            if sub.map_type == "learn" and name in crf_params:
                crf_params[name] = crf_init_identity(
                    sub, crf_params[name], k_fit, steps=crf_prefit_steps)

    params = {"nerf": nerf_params, "crf": crf_params}
    return TrainState(step=jnp.zeros((), jnp.int32), params=params,
                      batch_stats=batch_stats, opt_state=tx.init(params))
