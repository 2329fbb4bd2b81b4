#!/usr/bin/env python
"""Round-2 TPU profiling: decompose the full train step's 1.14 s.

Isolates (a) forward vs backward, (b) tri-plane gather fwd/vjp at the
fine-pass scale, (c) MLP/compositing-only cost, (d) single-take concat
probe, (e) bf16 table probe. All timings force a host transfer per step
(axon backends do not honor block_until_ready).
"""

import time

import jax
import jax.numpy as jnp
import numpy as np

from evdeblurnerf_tpu.ops import triplane


def timeit(fn, *args, iters=5, warmup=2, sync=None):
    for _ in range(warmup):
        out = fn(*args)
        (sync or _default_sync)(out)
    t0 = time.perf_counter()
    for _ in range(iters):
        out = fn(*args)
        (sync or _default_sync)(out)
    return (time.perf_counter() - t0) / iters


def _default_sync(out):
    leaf = jax.tree_util.tree_leaves(out)[0]
    _ = float(jnp.asarray(leaf).ravel()[0])


def main():
    dev = jax.devices()[0]
    print("device:", dev, flush=True)
    rng = np.random.default_rng(0)

    import os

    # === A. isolated tri-plane packed sampling at fine-pass scale ===
    # fine grid at paper scale: n_voxels=134217984 -> aabb-derived dims;
    # reproduce voxnerf sizing: roughly cubic ~512
    for tag, (HWD, comps) in ({} if os.environ.get("PROFILE_SKIP_A") else {
        "coarse(256^3)": ((256, 256, 256), (64, 16, 16)),
        "fine(512^3)": ((512, 512, 512), (64, 16, 16)),
    }).items():
        H, W, D = HWD
        planes = [jnp.asarray(rng.normal(size=(c, H, W)), jnp.float32)
                  for c in comps]
        lines = [jnp.asarray(rng.normal(size=(c, D)), jnp.float32)
                 for c in comps]
        N = 2_359_296  # 18432 rays x 128 samples
        xyz = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)

        @jax.jit
        def fwd(planes, lines, xyz):
            pp, pl_ = triplane.pack_grids(planes, lines)
            return triplane.triplane_features_packed(pp, pl_, xyz)

        @jax.jit
        def fwd_bwd(planes, lines, xyz):
            def loss(planes, lines):
                pp, pl_ = triplane.pack_grids(planes, lines)
                f = triplane.triplane_features_packed(pp, pl_, xyz)
                return jnp.sum(f * f)
            l, g = jax.value_and_grad(loss, argnums=(0, 1))(planes, lines)
            # consume the grads so the backward isn't dead-code-eliminated
            gsum = sum(jnp.sum(t) for t in jax.tree_util.tree_leaves(g))
            return l + 0.0 * gsum

        t_f = timeit(fwd, planes, lines, xyz)
        t_fb = timeit(fwd_bwd, planes, lines, xyz)
        print(f"[{tag}] packed fwd {N} pts: {t_f*1e3:.1f} ms "
              f"({t_f/N*1e9:.1f} ns/pt) | fwd+bwd: {t_fb*1e3:.1f} ms",
              flush=True)

        # concat-tables probe: 3 plane takes -> 1 take of a merged table
        pp, pl_ = jax.jit(lambda p, l: triplane.pack_grids(p, l))(
            planes, lines)

        @jax.jit
        def fwd_concat(planes, lines, xyz):
            pp, pl_ = triplane.pack_grids(planes, lines)
            C = pp[0][0].shape[-1]
            Cmax = max(p[0].shape[-1] for p in pp)
            padded = [jnp.pad(p[0], ((0, 0), (0, Cmax - p[0].shape[-1])))
                      for p in pp]
            big = jnp.concatenate(padded, axis=0)
            offs = np.cumsum([0] + [p[0].shape[0] for p in pp[:-1]])
            outs = []
            for i in range(3):
                m0, m1 = triplane.MAT_MODE[i]
                _, Hh, Ww = pp[i]
                fx = (xyz[:, m0] + 1) * 0.5 * (Ww - 1)
                fy = (xyz[:, m1] + 1) * 0.5 * (Hh - 1)
                bx = jnp.clip(jnp.floor(fx), 0, Ww - 2).astype(jnp.int32)
                by = jnp.clip(jnp.floor(fy), 0, Hh - 2).astype(jnp.int32)
                outs.append(by * Ww + bx + int(offs[i]))
            idx = jnp.concatenate(outs)
            rows = jnp.take(big, idx, axis=0)
            return rows.sum()

        t_c = timeit(fwd_concat, planes, lines, xyz)
        print(f"[{tag}] concat-single-take (3N rows, widest C): "
              f"{t_c*1e3:.1f} ms", flush=True)

        # bf16 tables probe
        planes16 = [p.astype(jnp.bfloat16) for p in planes]
        lines16 = [l.astype(jnp.bfloat16) for l in lines]

        @jax.jit
        def fwd16(planes, lines, xyz):
            pp, pl_ = triplane.pack_grids(planes, lines)
            f = triplane.triplane_features_packed(pp, pl_, xyz)
            return f.astype(jnp.float32)

        t16 = timeit(fwd16, planes16, lines16, xyz)
        print(f"[{tag}] packed fwd bf16 tables: {t16*1e3:.1f} ms", flush=True)

    # === C. scatter-side decomposition (plane vs line VJPs) ===
    if os.environ.get("PROFILE_C"):
        H, W, D = 512, 512, 512
        comps = (64, 16, 16)
        planes = [jnp.asarray(rng.normal(size=(c, H, W)), jnp.float32)
                  for c in comps]
        lines = [jnp.asarray(rng.normal(size=(c, D)), jnp.float32)
                 for c in comps]
        N = 2_359_296
        xyz = jnp.asarray(rng.uniform(-1, 1, (N, 3)), jnp.float32)

        def consume(l, g):
            return l + 0.0 * sum(jnp.sum(t)
                                 for t in jax.tree_util.tree_leaves(g))

        @jax.jit
        def planes_fb(planes, xyz):
            def loss(planes):
                tot = 0.0
                for i in range(3):
                    m0, m1 = triplane.MAT_MODE[i]
                    packed = triplane.pack_plane(planes[i])
                    f = triplane.grid_sample_2d_packed(
                        packed, planes[i].shape[1], planes[i].shape[2],
                        xyz[:, m0], xyz[:, m1])
                    tot = tot + jnp.sum(f * f)
                return tot
            l, g = jax.value_and_grad(loss)(planes)
            return consume(l, g)

        @jax.jit
        def lines_fb(lines, xyz):
            def loss(lines):
                tot = 0.0
                for i in range(3):
                    packed = triplane.pack_line(lines[i])
                    f = triplane.grid_sample_1d_packed(
                        packed, lines[i].shape[1], xyz[:, triplane.VEC_MODE[i]])
                    tot = tot + jnp.sum(f * f)
                return tot
            l, g = jax.value_and_grad(loss)(lines)
            return consume(l, g)

        @jax.jit
        def planes_fwd(planes, xyz):
            tot = 0.0
            for i in range(3):
                m0, m1 = triplane.MAT_MODE[i]
                packed = triplane.pack_plane(planes[i])
                f = triplane.grid_sample_2d_packed(
                    packed, planes[i].shape[1], planes[i].shape[2],
                    xyz[:, m0], xyz[:, m1])
                tot = tot + jnp.sum(f * f)
            return tot

        @jax.jit
        def lines_fwd(lines, xyz):
            tot = 0.0
            for i in range(3):
                packed = triplane.pack_line(lines[i])
                f = triplane.grid_sample_1d_packed(
                    packed, lines[i].shape[1], xyz[:, triplane.VEC_MODE[i]])
                tot = tot + jnp.sum(f * f)
            return tot

        tpf = timeit(planes_fwd, planes, xyz, sync=lambda o: float(o))
        tpb = timeit(planes_fb, planes, xyz, sync=lambda o: float(o))
        tlf = timeit(lines_fwd, lines, xyz, sync=lambda o: float(o))
        tlb = timeit(lines_fb, lines, xyz, sync=lambda o: float(o))
        print(f"[scatter] planes fwd {tpf*1e3:.1f} ms, fwd+bwd {tpb*1e3:.1f}"
              f" ms (bwd ~{(tpb-tpf)*1e3:.1f})", flush=True)
        print(f"[scatter] lines  fwd {tlf*1e3:.1f} ms, fwd+bwd {tlb*1e3:.1f}"
              f" ms (bwd ~{(tlb-tlf)*1e3:.1f})", flush=True)

        # line grads as blocked one-hot matmul (tent weights), f32
        BLK = 8192

        @jax.jit
        def line_grad_matmul(lines, xyz, g):
            # g: upstream grads [N, 2C]; emulate the 3 projections of one
            # grid. Blocked: one-hot [BLK, D] built in-register per chunk,
            # immediately contracted on the MXU, accumulated over chunks.
            outs = []
            for i in range(3):
                D_i = lines[i].shape[1]
                C2 = 2 * lines[i].shape[0]
                y = xyz[:, triplane.VEC_MODE[i]]
                fy = (y + 1.0) * 0.5 * (D_i - 1)
                b = jnp.clip(jnp.floor(fy), 0, D_i - 2)
                frac = fy - b
                d_iota = jnp.arange(D_i, dtype=jnp.float32)

                def body(acc, xs):
                    b_c, f_c, g_c = xs
                    M0 = (d_iota[None, :] == b_c[:, None]).astype(jnp.float32)
                    M1 = (d_iota[None, :] == (b_c + 1)[:, None]).astype(
                        jnp.float32)
                    Mw = M0 * (1 - f_c)[:, None] + M1 * f_c[:, None]
                    return acc + jnp.dot(
                        Mw.T, g_c, preferred_element_type=jnp.float32), None

                nblk = N // BLK
                xs = (b.reshape(nblk, BLK), frac.reshape(nblk, BLK),
                      g[:, :C2].reshape(nblk, BLK, C2))
                acc, _ = jax.lax.scan(body, jnp.zeros((D_i, C2)), xs)
                outs.append(acc)
            return sum(jnp.sum(o) for o in outs)

        g = jnp.asarray(rng.normal(size=(N, 128)), jnp.float32)
        tmm = timeit(line_grad_matmul, lines, xyz, g,
                     sync=lambda o: float(o))
        print(f"[scatter] line-grad one-hot matmul (3 proj): {tmm*1e3:.1f} ms",
              flush=True)
        return

    # === B. full step decomposition at bench scale ===
    from evdeblurnerf_tpu.config import default_args
    from evdeblurnerf_tpu.models.renderer import RenderConfig
    from evdeblurnerf_tpu.models.system import (EvDeblurNeRF,
                                                kernel_config_from_args)
    from evdeblurnerf_tpu.models.tonemapping import TonemappingTransform
    from evdeblurnerf_tpu.train.optim import build_optimizer
    from evdeblurnerf_tpu.train.state import create_train_state
    from evdeblurnerf_tpu.train.step import (build_train_step,
                                             compute_schedule_weights)
    from evdeblurnerf_tpu.utils.misc import annealing_interpolator

    H, W, focal = 480, 640, 500.0
    N_RAND, PTNUM, EV_N = 1024, 10, 4096
    args = default_args(
        N_rand=N_RAND, events_N_rand=EV_N,
        N_samples=64, N_importance=64, mode="c2f",
        kernel_type="RBK", kernel_ptnum=PTNUM, kernel_rbk_use_origin=True,
        kernel_use_awp=True, kernel_img_embed=32,
        kernel_rbk_extra_feat_ch=0, kernel_start_iter=0,
        use_viewdirs=True, use_events=True, add_event_egm=True,
        add_event_egm_stages=["stage0", "stage1"],
        tone_mapping_events_type="learn",
        tone_mapping_events_add_bii="pos-neg",
        lrate=5e-3, lrate_decay=10, seed=0,
        remat=False, grad_accum=int(os.environ.get('GRAD_ACCUM', '2')),
    )
    args.events_threshold_pos = args.events_threshold
    args.events_threshold_neg = args.events_threshold
    cfg = RenderConfig(
        mode="c2f", N_samples=64, N_importance=64, use_viewdirs=True,
        multires=10, multires_views=4, ndc=True, near=0.0, far=1.0,
        H=H, W=W, focal=focal,
        aabb=((-1.6, -1.7, -1.0), (1.7, 1.6, 1.0)),
        coarse_n_voxels=16777248, fine_n_voxels=134217984,
        coarse_app_n_comp=(64, 16, 16), fine_app_n_comp=(64, 16, 16),
        coarse_hidden_dim=64, coarse_hidden_dim_color=64,
        fine_hidden_dim=256, fine_hidden_dim_color=256,
        fine_geo_feat_dim=128, coarse_app_dim=32, fine_app_dim=32,
        kernel_feat_cnl=15, kernel_type="RBK", use_awp=True)
    kcfg = kernel_config_from_args(args)
    K = ((focal, 0.0, W / 2), (0.0, focal, H / 2), (0.0, 0.0, 1.0))
    model = EvDeblurNeRF(cfg=cfg, kcfg=kcfg, num_images=30, K=K)
    crf = TonemappingTransform(map_type_rgb="none", map_type_event="learn",
                               extra_features_event=2)

    def make_rays(n, seed):
        r = np.random.default_rng(seed)
        o = r.normal(size=(n, 3)).astype(np.float32) * 0.05
        d = r.normal(size=(n, 3)).astype(np.float32)
        d[:, 2] = -np.abs(d[:, 2]) - 0.5
        return np.stack([o, d], axis=-1)

    batch = {
        "rays": make_rays(N_RAND, 0),
        "rays_x": rng.uniform(0, W, N_RAND).astype(np.float32),
        "rays_y": rng.uniform(0, H, N_RAND).astype(np.float32),
        "images_idx": rng.integers(0, 30, N_RAND).astype(np.int32),
        "poses": np.broadcast_to(
            np.concatenate([np.eye(3), np.zeros((3, 1))], -1),
            (N_RAND, 3, 4)).astype(np.float32),
        "rgbsf": rng.uniform(0, 1, (N_RAND, 3)).astype(np.float32),
    }
    ev_batch = {
        "events_rays_start": make_rays(EV_N, 1),
        "events_rays_end": make_rays(EV_N, 2),
        "events_pos_pol_cumsum": rng.integers(0, 3, EV_N).astype(np.float32),
        "events_neg_pol_cumsum": -rng.integers(0, 3, EV_N).astype(np.float32),
    }
    key = jax.random.PRNGKey(0)
    tx = build_optimizer(args.lrate, args.lrate_decay)
    rays_info = {k: batch[k] for k in
                 ("images_idx", "rays_x", "rays_y", "poses")}
    state = create_train_state(model, crf, tx, key, batch["rays"], rays_info)
    batch = jax.device_put(batch)
    ev_batch = jax.device_put(ev_batch)
    sw = compute_schedule_weights(
        args, 0, kernel_end_warmup_iter=-1, w_kernel=lambda s: 1.0,
        w_pts0_target=lambda s: 0.0,
        w_events_egm=annealing_interpolator(1.0, 1.0, None, "constant"),
        fine_loss_weight=0.1, events_active=True)

    step_fn = build_train_step(model, crf, tx, args)

    cell = {"state": state}

    def full():
        cell["state"], aux = step_fn(cell["state"], batch, ev_batch, key, sw,
                                     force_naive=False, events_active=True)
        return aux["loss"]

    t_full = timeit(full, iters=5, sync=lambda out: float(out))
    state = cell["state"]
    rays_per_iter = N_RAND * PTNUM + 2 * EV_N
    print(f"[step] full train step: {t_full*1e3:.1f} ms "
          f"({rays_per_iter / t_full:.0f} rays/s)", flush=True)

    # forward-only loss (no grad, no optimizer)
    variables = {"params": state.params}
    if state.batch_stats:
        variables["batch_stats"] = state.batch_stats

    @jax.jit
    def fwd_only(params, batch, ev_batch):
        v = {"params": params["nerf"]}
        if state.batch_stats:
            v["batch_stats"] = state.batch_stats
        out = model.apply(v, key, batch["rays"], rays_info,
                          force_naive=False, return_pts0_rgb=True,
                          mutable=["batch_stats"] if state.batch_stats else
                          False)
        if state.batch_stats:
            out, _ = out
        rgb = out[0]
        # event branch: two naive renders
        o1 = model.apply(v, key, ev_batch["events_rays_start"], None,
                         force_naive=True, return_pts0_rgb=False,
                         mutable=["batch_stats"] if state.batch_stats else
                         False)
        o2 = model.apply(v, key, ev_batch["events_rays_end"], None,
                         force_naive=True, return_pts0_rgb=False,
                         mutable=["batch_stats"] if state.batch_stats else
                         False)
        if state.batch_stats:
            o1, o2 = o1[0], o2[0]
        return jnp.sum(rgb) + jnp.sum(o1[0]) + jnp.sum(o2[0])

    t_fwd = timeit(fwd_only, state.params, batch, ev_batch, iters=5,
                   sync=lambda out: float(out))
    print(f"[step] forward-only: {t_fwd*1e3:.1f} ms "
          f"(backward+opt = {(t_full - t_fwd)*1e3:.1f} ms)", flush=True)


if __name__ == "__main__":
    main()
