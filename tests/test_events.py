import h5py
import jax.numpy as jnp
import numpy as np
import pytest

from evdeblurnerf_tpu.ops import events_native
from evdeblurnerf_tpu.utils import edi, events as events_util


def _brute_force_successor(ids):
    n = len(ids)
    succ = np.empty(n, dtype=np.int64)
    cnt = np.empty(n, dtype=np.int32)
    for i in range(n):
        nxt = [j for j in range(i + 1, n) if ids[j] == ids[i]]
        succ[i] = nxt[0] if nxt else i
        cnt[i] = len(nxt)
    return succ, cnt


def test_native_library_builds():
    assert events_native.native_available(), "C++ event kernels failed to build"


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_compute_successor_matches_bruteforce(impl):
    rng = np.random.default_rng(0)
    ids = rng.integers(0, 13, size=200).astype(np.int64)
    fn = (events_native.compute_successor if impl == "native"
          else events_native.compute_successor_np)
    succ, cnt, latest, first = fn(ids)
    e_succ, e_cnt = _brute_force_successor(ids)
    np.testing.assert_array_equal(succ, e_succ)
    np.testing.assert_array_equal(cnt, e_cnt)
    # latest_seen holds the FIRST event index per pixel after the reverse
    # scan; first_seen holds the last (ref: utils/events.py:92-118)
    for pix in np.unique(ids):
        where = np.nonzero(ids == pix)[0]
        assert latest[pix] == where[0]
        assert first[pix] == where[-1]


def test_successor_native_numpy_agree_large():
    rng = np.random.default_rng(1)
    ids = rng.integers(0, 500, size=20000).astype(np.int64)
    a = events_native.compute_successor(ids)
    b = events_native.compute_successor_np(ids)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_accumulate_events(impl):
    # single pixel: events group in runs of n with summed polarity
    events = np.array([[0, 10, 1], [0, 20, -1], [0, 30, 1],
                       [0, 40, 1], [0, 50, 1]], dtype=np.int64)
    fn = (events_native.accumulate_events if impl == "native"
          else events_native.accumulate_events_np)
    out = fn(events, 2)
    # first event always emits; then every 2nd
    np.testing.assert_array_equal(
        out, [[0, 10, 1], [0, 30, 0], [0, 50, 2]])


def test_accumulate_native_numpy_agree():
    rng = np.random.default_rng(2)
    n_ev = 5000
    events = np.stack([
        rng.integers(0, 37, n_ev),
        np.sort(rng.integers(0, 100000, n_ev)),
        rng.choice([-1, 1], n_ev)], -1).astype(np.int64)
    for n in (1, 2, 5):
        a = events_native.accumulate_events(events, n)
        b = events_native.accumulate_events_np(events, n)
        # row sets must agree independent of ordering
        a_sorted = a[np.lexsort(a.T[::-1])]
        b_sorted = b[np.lexsort(b.T[::-1])]
        np.testing.assert_array_equal(a_sorted, b_sorted)


def test_accumulate_events_at_time():
    events = np.array([[0, 10, 1], [1, 12, -1], [0, 25, 1], [0, 35, 1]],
                      dtype=np.int64)
    tms = np.array([0, 20, 40])
    out, zero = events_native.accumulate_events_at_time(
        events, tms, 0, return_zeroevents=True)
    # interval [0,20): pixel0 +1, pixel1 -1; interval [20,40): pixel0 +2
    assert {tuple(r) for r in out} == {(0, 20, 1), (1, 20, -1), (0, 40, 2)}
    assert (1, 20, 40) in {tuple(r) for r in zero}


def test_accumulate_at_time_native_numpy_agree():
    """C++ twin of the timestamp-grid accumulator (ref utils/events.py:
    174-218 is Numba there) must agree with the vectorized numpy path
    row-for-row, including zero-event rows and the n-subsampling."""
    lib = events_native._load_library()
    if lib is None or not hasattr(lib, "accumulate_events_at_time_flat"):
        pytest.skip("native library unavailable")
    rng = np.random.default_rng(7)
    n_ev, n_pix = 5000, 37
    t = np.sort(rng.integers(0, 10_000, n_ev))
    events = np.stack([rng.integers(0, n_pix, n_ev), t,
                       rng.choice([-1, 1], n_ev)], -1).astype(np.int64)
    tms = np.linspace(0.0, 10_000.0, 23)
    for n in (0, 1, 3):
        a = events_native._accumulate_events_at_time_cpp(
            lib, events, tms, n, return_zeroevents=True)
        b = events_native.accumulate_events_at_time_np(
            events, tms, n, return_zeroevents=True)
        for x, y in zip(a, b):
            np.testing.assert_array_equal(x, y)


@pytest.mark.parametrize("impl", ["native", "numpy"])
def test_gather_successor_hops(impl):
    # chain on one pixel: indices 0->1->2->3, polarities +1,-1,+1,-1
    succ = np.array([1, 2, 3, 3], dtype=np.int64)
    pol = np.array([1, -1, 1, -1], dtype=np.int64)
    fn = (events_native.gather_successor if impl == "native"
          else events_native.gather_successor_np)
    idx, neg, pos = fn(np.array([0, 0]), np.array([0, 2]), succ, pol)
    # hops=0: one step -> event 1 (pol -1)
    assert idx[0] == 1 and neg[0] == -1 and pos[0] == 0
    # hops=2: three steps -> events 1,2,3 (pols -1,+1,-1)
    assert idx[1] == 3 and neg[1] == -2 and pos[1] == 1


def test_gather_native_numpy_agree():
    rng = np.random.default_rng(3)
    ids = rng.integers(0, 50, size=3000).astype(np.int64)
    succ, cnt, _, _ = events_native.compute_successor(ids)
    pol = rng.choice([-1, 1], size=3000).astype(np.int64)
    q = np.nonzero(cnt > 3)[0][:200]
    hops = rng.integers(0, 3, size=q.shape[0]).astype(np.int64)
    a = events_native.gather_successor(q, hops, succ, pol)
    b = events_native.gather_successor_np(q, hops, succ, pol)
    for x, y in zip(a, b):
        np.testing.assert_array_equal(x, y)


def test_load_events_h5_int_and_float_coords(tmp_path):
    h, w = 6, 8
    rng = np.random.default_rng(4)
    n = 300
    x = rng.integers(0, w, n).astype(np.float64)
    y = rng.integers(0, h, n).astype(np.float64)
    t = np.sort(rng.integers(0, 1e6, n)).astype(np.float64)
    p = rng.choice([-1, 1], n)

    path = tmp_path / "events.h5"
    with h5py.File(path, "w") as f:
        for k, v in dict(x=x, y=y, t=t, p=p).items():
            f[k] = v
    ev, zero_ids, id2c = events_util.load_events_h5(str(path), h, w,
                                                    events_tms_unit="us")
    assert ev.shape == (n, 3)
    # flat ids reconstruct coordinates
    np.testing.assert_array_equal(ev[:, 0], (y * w + x).astype(np.int64))
    np.testing.assert_array_equal(ev[:, 2], p)

    # float (rectified) coords -> compact ids
    xf = x + rng.uniform(0, 0.5, n)
    path2 = tmp_path / "events_f.h5"
    with h5py.File(path2, "w") as f:
        for k, v in dict(x=xf, y=y, t=t, p=p).items():
            f[k] = v
    ev2, zero2, id2c2 = events_util.load_events_h5(str(path2), h, w,
                                                   events_tms_unit="us")
    assert id2c2.shape[1] == 2
    recon = id2c2[ev2[:, 0]]
    np.testing.assert_allclose(recon[:, 0], xf, atol=1e-6)
    np.testing.assert_allclose(recon[:, 1], y, atol=1e-6)


def test_egm_loss_matches_reference_formula():
    rng = np.random.default_rng(5)
    n = 64
    ls = rng.uniform(0.01, 1, (n, 1)).astype(np.float32)
    le = rng.uniform(0.01, 1, (n, 1)).astype(np.float32)
    bii = rng.normal(size=n).astype(np.float32)
    expected = np.mean(
        (np.log(le + 1e-5).squeeze() - np.log(ls + 1e-5).squeeze() - bii) ** 2)
    ours = float(events_util.egm_loss(jnp.asarray(ls), jnp.asarray(le),
                                      jnp.asarray(bii)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_egm_loss_color_mask_and_weights():
    rng = np.random.default_rng(6)
    n = 60
    ls = rng.uniform(0.01, 1, (n, 3)).astype(np.float32)
    le = rng.uniform(0.01, 1, (n, 3)).astype(np.float32)
    bii = rng.normal(size=n).astype(np.float32)
    cidx = rng.integers(0, 3, n)
    mask = np.eye(3, dtype=bool)[cidx]
    cw = np.array([0.4, 0.2, 0.4], np.float32)

    pred = (np.log(le + 1e-5) - np.log(ls + 1e-5))[np.arange(n), cidx]
    w = cw[cidx]
    expected = np.sum((pred - bii) ** 2 * w) / w.sum()
    ours = float(events_util.egm_loss(
        jnp.asarray(ls), jnp.asarray(le), jnp.asarray(bii),
        color_mask=jnp.asarray(mask), color_weight=jnp.asarray(cw)))
    np.testing.assert_allclose(ours, expected, rtol=1e-5)


def test_bilinear_splat_conserves_mass():
    rng = np.random.default_rng(7)
    n = 50
    x = rng.uniform(0.5, 6.5, n)
    y = rng.uniform(0.5, 4.5, n)
    v = rng.uniform(0.5, 2.0, n)
    img = edi.interpolate_subpixel(x, y, v, 8, 6)
    np.testing.assert_allclose(img.sum(), v.sum(), rtol=1e-6)


def test_edi_deblur_recovers_sharp_image():
    """Synthesize: log-brightness ramps linearly over the exposure; the
    blurry frame is the mean of exp(log L). EDI must recover the mid frame."""
    rng = np.random.default_rng(8)
    h, w = 12, 16
    sharp = rng.uniform(0.2, 0.8, (h, w)).astype(np.float32)
    steps = 9
    N = (steps - 1) // 2
    ramp = rng.uniform(-0.1, 0.1, (h, w)).astype(np.float32)  # per-interval dlogL
    bii = np.stack([ramp] * (2 * N), axis=0)
    # frames at each instant: L_k = sharp * exp(sum of bii from mid)
    frames = np.exp(edi.inner_double_integral(bii)) * sharp
    blurry = frames.mean(0)
    recovered = edi.deblur_double_integral(blurry, bii)
    np.testing.assert_allclose(recovered, sharp, rtol=1e-5)
