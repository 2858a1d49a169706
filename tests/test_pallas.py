"""Pallas fused four-step kernel: interpret-mode parity on CPU.

The real-chip run is covered by bench.py / the verify drives; this pins the
kernel math (tiling, contractions, twiddle fusion, output transpose layout)
against the float64 oracle in the Pallas interpreter.
"""

import numpy as np
import pytest

import jax
import jax.numpy as jnp

from kofft_tpu.ops.dft import snr_db
from kofft_tpu.ops.pallas_kernels import (_pow2_split, fused_four_step_fft,
                                          fused_four_step_supported)


def test_supported_predicate():
    assert fused_four_step_supported(1 << 16)
    assert fused_four_step_supported(1 << 20)
    assert not fused_four_step_supported(1000)      # non-pow2
    assert not fused_four_step_supported(1 << 10)   # factors < 128
    assert fused_four_step_supported(1 << 25)       # r5: native to 2^26
    assert fused_four_step_supported(1 << 26)
    assert not fused_four_step_supported(1 << 27)   # beyond the range


def test_pow2_split_balance():
    assert _pow2_split(1 << 16) == (256, 256)
    assert _pow2_split(1 << 17) == (256, 512)
    assert _pow2_split(1 << 14) == (128, 128)
    # 2^24+: balanced/short-n2 splits (stage-2 scoped VMEM grows with
    # n2 — lane dims cannot shrink below 128; and (4096, 4096) beats
    # (2048, 8192) at `highest` on re-probe, exp_p56/exp_sdt)
    assert _pow2_split(1 << 23) == (2048, 4096)
    assert _pow2_split(1 << 24) == (4096, 4096)
    assert _pow2_split(1 << 25) == (4096, 8192)
    assert _pow2_split(1 << 26) == (8192, 8192)


@pytest.mark.parametrize("n", [1 << 14, 1 << 15])
def test_kernel_parity_interpret(rng, n):
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    xr = np.ascontiguousarray(x.real)[None]
    xi = np.ascontiguousarray(x.imag)[None]
    import jax.numpy as jnp
    yr, yi = fused_four_step_fft(jnp.asarray(xr), jnp.asarray(xi), n,
                                 interpret=True)
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    ref = np.fft.fft(x.astype(np.complex128))
    assert snr_db(ref, got) > 100.0


def test_kernel_batch_interpret(rng):
    n = 1 << 14
    x = rng.standard_normal((3, n)).astype(np.float32)
    import jax.numpy as jnp
    yr, yi = fused_four_step_fft(jnp.asarray(x), jnp.zeros_like(x), n,
                                 interpret=True)
    ref = np.fft.fft(x.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0


def test_phased_batched_grid_parity_interpret(rng, monkeypatch):
    """Batched rows through the phased kernel's (b, phases) grid (the
    chip path for b > 1 at n >= 2^20; a lax.scan restructure is a
    recorded negative result — benchmarks/exp_batch_scan.py). Forcing
    bt=1 exercises the b > 1 phased branch at a CPU-friendly size."""
    from kofft_tpu.ops import pallas_kernels as PK
    monkeypatch.setattr(PK, "_ml_batch_tile", lambda b, n1, n2: 1)
    n = 1 << 14
    x = rng.standard_normal((3, n)).astype(np.float32)
    y = rng.standard_normal((3, n)).astype(np.float32)
    yr, yi = PK.fused_multilevel_fft(x, y, n, interpret=True)
    assert yr.shape == (3, n)
    ref = np.fft.fft(x.astype(np.float64) + 1j * y.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0


@pytest.mark.parametrize("n", [1 << 14, 1 << 15])
def test_multilevel_kernel_parity_interpret(rng, n):
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_fft
    import jax.numpy as jnp
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    yr, yi = fused_multilevel_fft(
        jnp.asarray(np.ascontiguousarray(x.real)[None]),
        jnp.asarray(np.ascontiguousarray(x.imag)[None]), n, interpret=True)
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    assert snr_db(np.fft.fft(x.astype(np.complex128)), got) > 100.0


def test_multilevel_batch_interpret(rng):
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_fft
    import jax.numpy as jnp
    n = 1 << 14
    x = rng.standard_normal((2, n)).astype(np.float32)
    yr, yi = fused_multilevel_fft(jnp.asarray(x), jnp.zeros_like(x), n,
                                  interpret=True)
    ref = np.fft.fft(x.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0


@pytest.mark.parametrize("batch", [(6,), (2, 4)])
def test_multilevel_batch_tiled_interpret(rng, batch):
    """Batch folding (bt > 1) must not change results for any divisible
    batch, including non-pow2 and multi-dim batches."""
    from kofft_tpu.ops.pallas_kernels import (_ml_batch_tile,
                                              fused_multilevel_fft)
    import jax.numpy as jnp
    n = 1 << 14
    b = int(np.prod(batch))
    assert _ml_batch_tile(b, 128, 128) > 1   # the folding actually engages
    x = (rng.standard_normal(batch + (n,))
         + 1j * rng.standard_normal(batch + (n,))).astype(np.complex64)
    yr, yi = fused_multilevel_fft(
        jnp.asarray(np.ascontiguousarray(x.real)),
        jnp.asarray(np.ascontiguousarray(x.imag)), n, interpret=True)
    ref = np.fft.fft(x.astype(np.complex128))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0


def test_multilevel_rfft_interpret(rng):
    """Real-input stage 1 (single plane in HBM) + one-sided stage 2 match
    numpy's rfft, including the Nyquist bin epilogue."""
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_rfft
    n = 1 << 14
    x = rng.standard_normal((3, n)).astype(np.float32)
    yr, yi = fused_multilevel_rfft(x, n, interpret=True)
    assert yr.shape == (3, n // 2 + 1) and yi.shape == (3, n // 2 + 1)
    ref = np.fft.rfft(x.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0


@pytest.mark.parametrize("mode", ["highest", "high", "default"])
def test_precision_modes_interpret(rng, mode):
    """All three kernel precision modes produce the right transform (the
    interpreter computes in f32, so even 'default' is near-exact here —
    this pins the mode plumbing and the bf16x3/Karatsuba formulations)."""
    from kofft_tpu import config
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_fft
    n = 1 << 14
    x = (rng.standard_normal(n) + 1j * rng.standard_normal(n)
         ).astype(np.complex64)
    config.set_precision(mode)
    try:
        yr, yi = fused_multilevel_fft(
            np.ascontiguousarray(x.real)[None],
            np.ascontiguousarray(x.imag)[None], n, interpret=True)
    finally:
        config.set_precision(None)
    got = np.asarray(yr)[0] + 1j * np.asarray(yi)[0]
    # bf16x3 ('high') rounds through bfloat16 even in interpret mode
    floor = 95.0 if mode == "high" else 100.0
    assert snr_db(np.fft.fft(x.astype(np.complex128)), got) > floor


def test_jnp_fft_zone_boundaries():
    """The measured-fastest-engine zone: batched mid-size pow2 only."""
    from kofft_tpu.ops.fft import _jnp_fft_zone
    assert _jnp_fft_zone((256, 1 << 14), 1 << 14)        # batched mid
    assert _jnp_fft_zone((16, 1 << 16), 1 << 16)
    assert not _jnp_fft_zone((1, 1 << 14), 1 << 14)      # single: ours wins
    assert not _jnp_fft_zone((8, 1 << 20), 1 << 20)      # large n: pallas
    assert not _jnp_fft_zone((4096, 1000), 1000)         # non-pow2
    assert not _jnp_fft_zone((4096, 1 << 11), 1 << 11)   # below zone


def test_jnpfft_backend_matches_oracle(rng):
    """The jnpfft engine (used inside the dispatch zone) stays on
    contract for values and normalization."""
    import kofft_tpu as kt
    n = 1 << 12
    x = (rng.standard_normal((64, n)) + 1j * rng.standard_normal((64, n))
         ).astype(np.complex64)
    got = kt.asnumpy(kt.fft(x, backend="jnpfft"))
    assert snr_db(np.fft.fft(x.astype(np.complex128)), got) > 100.0
    back = kt.asnumpy(kt.ifft(got, backend="jnpfft"))
    assert np.abs(back - x).max() < 1e-3


def test_fft_transpose_identity(rng):
    """The custom-VJP rule for the Pallas kernels rests on: the real-linear
    transpose of the forward planes map is the unnormalized inverse (and
    vice versa). Verify via jax.linear_transpose on the engine (the same
    math the kernels implement); the on-chip wiring is checked by the
    Parseval gradient drive in the verify recipe."""
    import jax
    import jax.numpy as jnp
    from kofft_tpu.ops.fft import _fft_planes

    n = 256
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    ctr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    cti = jnp.asarray(rng.standard_normal(n).astype(np.float32))

    fwd = lambda a, b: _fft_planes(a, b, n, False, "xla", "float32")
    inv = lambda a, b: _fft_planes(a, b, n, True, "xla", "float32")

    # linear_transpose returns a tuple of cotangents matching the inputs
    got = jax.linear_transpose(fwd, jnp.asarray(xr),
                               jnp.asarray(xi))((ctr, cti))
    want = inv(ctr, cti)
    assert np.allclose(np.asarray(got[0]), np.asarray(want[0]), atol=1e-2)
    assert np.allclose(np.asarray(got[1]), np.asarray(want[1]), atol=1e-2)

    got_i = jax.linear_transpose(inv, jnp.asarray(xr),
                                 jnp.asarray(xi))((ctr, cti))
    want_i = fwd(ctr, cti)
    assert np.allclose(np.asarray(got_i[0]), np.asarray(want_i[0]),
                       atol=1e-2)
    assert np.allclose(np.asarray(got_i[1]), np.asarray(want_i[1]),
                       atol=1e-2)


def test_backend_request_semantics():
    """'auto' is first-class (zones may reroute it); an explicit backend
    is honored exactly and never zone-rerouted."""
    from kofft_tpu.config import set_backend
    from kofft_tpu.ops.fft import resolve_backend
    assert resolve_backend(None) == "auto"
    assert resolve_backend("pallas") == "pallas"
    assert resolve_backend("xla") == "xla"
    set_backend("xla")
    try:
        assert resolve_backend(None) == "xla"       # config override
        assert resolve_backend("pallas") == "pallas"  # explicit still wins
    finally:
        set_backend(None)
    assert resolve_backend(None) == "auto"


def test_vmem_guard_contract():
    """Large-n / wide-tile / folded-batch multilevel builds must carry the
    raised Mosaic vmem limit: removing the guard breaks 2^22-2^24 on chip
    (commit b314492). This pins the guard's activation conditions so a
    refactor that drops it fails off-chip."""
    from kofft_tpu.ops.pallas_kernels import _ml_compiler_kwargs

    def limit(kw):
        return kw["compiler_params"].vmem_limit_bytes if kw else 0

    # 2^22+: n1 reaches 2048 -> guard required, >= 64 MB headroom
    assert limit(_ml_compiler_kwargs(False, 2048, 128, 1)) >= 64 * 2 ** 20
    # wide tiles and folded batch rows also exceed the 16 MB default
    assert limit(_ml_compiler_kwargs(False, 1024, 256, 1)) >= 64 * 2 ** 20
    assert limit(_ml_compiler_kwargs(False, 1024, 128, 2)) >= 64 * 2 ** 20
    # the small default-tiling case must NOT override Mosaic's default
    assert _ml_compiler_kwargs(False, 1024, 128, 1) == {}
    # interpret mode (CPU tests) never passes TPU compiler params
    assert _ml_compiler_kwargs(True, 4096, 256, 8) == {}


@pytest.mark.parametrize("logn", [22, 24])
def test_multilevel_large_n_traces(logn):
    """Trace-level structure check of the 2^22/2^24 compiled-path kernels
    (interpret=False, the real BlockSpecs/grids/compiler params):
    jax.eval_shape runs Pallas' trace-time validation — grid/BlockSpec
    divisibility, block shapes, out_shape consistency — without needing a
    TPU to lower to Mosaic. Catches structural breakage of the large-n
    path that interpret-mode parity (capped at 2^15 for runtime) cannot."""
    from kofft_tpu.ops.pallas_kernels import (fused_multilevel_fft,
                                              fused_multilevel_rfft)
    n = 1 << logn
    sds = jax.ShapeDtypeStruct((1, n), jnp.float32)
    out = jax.eval_shape(lambda a, b: fused_multilevel_fft(a, b, n),
                         sds, sds)
    assert tuple(out[0].shape) == (1, n)
    outr = jax.eval_shape(lambda a: fused_multilevel_rfft(a, n), sds)
    assert tuple(outr[0].shape) == (1, n // 2 + 1)


def test_twocall_path_parity_interpret(rng):
    """The two-call kernels (the n > 2^22 / batch-folded path, now that
    bt == 1 shapes ride the phased one-call kernel) keep their oracle
    parity, exercised via the stage functions directly."""
    from kofft_tpu.ops.pallas_kernels import _build_ml, _pow2_split
    n = 1 << 14
    n1, n2 = _pow2_split(n)
    x = rng.standard_normal((2, n)).astype(np.float32)
    z = rng.standard_normal((2, n)).astype(np.float32)
    _, _, s1, s1r, s2, s2h = _build_ml(n, "float32", True, "highest", 1)
    cr, ci = s1(2, x.reshape(2, n1, n2), z.reshape(2, n1, n2))
    yr, yi = s2(2, cr, ci)
    got = (np.asarray(yr).reshape(2, n)
           + 1j * np.asarray(yi).reshape(2, n))
    ref = np.fft.fft(x.astype(np.float64) + 1j * z.astype(np.float64))
    assert snr_db(ref, got) > 100.0
    # real-input stage 1 + one-sided stage 2
    cr, ci = s1r(2, x.reshape(2, n1, n2))
    hr, hi = s2h(2, cr, ci)
    refr = np.fft.rfft(x.astype(np.float64))[..., : n // 2]
    goth = (np.asarray(hr).reshape(2, n // 2)
            + 1j * np.asarray(hi).reshape(2, n // 2))
    assert snr_db(refr, goth) > 100.0


def test_phased_vs_twocall_same_output(rng):
    """The phased one-call kernel and the two-call kernels compute the
    same transform (layout included)."""
    from kofft_tpu.ops.pallas_kernels import (_build_ml, _build_phased,
                                              _pow2_split)
    n = 1 << 14
    n1, n2 = _pow2_split(n)
    x = rng.standard_normal((1, n1, n2)).astype(np.float32)
    z = rng.standard_normal((1, n1, n2)).astype(np.float32)
    run = _build_phased(n, "float32", True, "highest")
    pr, pi = run(1, x, z)
    _, _, s1, _, s2, _ = _build_ml(n, "float32", True, "highest", 1)
    cr, ci = s1(1, x, z)
    tr, ti = s2(1, cr, ci)
    np.testing.assert_allclose(np.asarray(pr), np.asarray(tr),
                               rtol=1e-4, atol=1e-2)
    np.testing.assert_allclose(np.asarray(pi), np.asarray(ti),
                               rtol=1e-4, atol=1e-2)


def test_twocall_rfft_nyquist_parity_interpret(rng):
    """The bt>1 (two-call) branch of fused_multilevel_rfft, INCLUDING
    its Nyquist epilogue, matches numpy end-to-end — the phased branch
    covers bt==1 shapes, so this pins the other branch's full one-sided
    output (review finding: the epilogue row source was untested)."""
    from kofft_tpu.ops.pallas_kernels import (_ml_batch_tile, _pow2_split,
                                              fused_multilevel_rfft)
    n = 1 << 14
    b = 8
    n1, n2 = _pow2_split(n)
    assert _ml_batch_tile(b, n1, n2) > 1, "test must exercise bt > 1"
    x = rng.standard_normal((b, n)).astype(np.float32)
    yr, yi = fused_multilevel_rfft(x, n, interpret=True)
    assert yr.shape == (b, n // 2 + 1)
    ref = np.fft.rfft(x.astype(np.float64))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert snr_db(ref, got) > 100.0
    # the Nyquist bin specifically (the epilogue's alternating sum)
    assert snr_db(ref[:, -1], got[:, -1]) > 100.0


def test_rdft_primitive_ad_rules_trace(rng):
    """The one-sided rfft primitive's jvp/transpose/batching rules trace
    with consistent shapes (r2 change: outputs are (..., n//2+1), the
    transpose zero-pads the cotangent back to n). eval_shape runs the
    rules without executing the TPU kernels, so a shape bug in any rule
    fails here off-chip."""
    from kofft_tpu.ops.pallas_fft import pallas_rfft_planes
    n = 1 << 14
    h = n // 2 + 1
    x = jax.ShapeDtypeStruct((3, n), jnp.float32)
    ct = [jax.ShapeDtypeStruct((3, h), jnp.float32)] * 2

    out = jax.eval_shape(lambda a: pallas_rfft_planes(a, n), x)
    assert tuple(out[0].shape) == (3, h) and tuple(out[1].shape) == (3, h)

    # jvp: tangent output shapes match primal
    o, to = jax.eval_shape(
        lambda a, da: jax.jvp(lambda v: pallas_rfft_planes(v, n),
                              (a,), (da,)), x, x)
    assert tuple(to[0].shape) == (3, h)

    # vjp/transpose: cotangent of the one-sided planes -> input shape
    def vjp_shape(a, c):
        _, pull = jax.vjp(lambda v: pallas_rfft_planes(v, n), a)
        return pull(c)
    (xbar,) = jax.eval_shape(vjp_shape, x, ct)
    assert tuple(xbar.shape) == (3, n)

    # batching: vmap over a new leading dim
    vx = jax.ShapeDtypeStruct((5, 3, n), jnp.float32)
    vout = jax.eval_shape(
        jax.vmap(lambda a: pallas_rfft_planes(a, n)), vx)
    assert tuple(vout[0].shape) == (5, 3, h)


def test_phased_flat_rfft_rank1_parity(rng):
    """Rank-1 phased rfft paths match numpy bin-for-bin including the
    Nyquist handling, and agree with the (1, n) / batched forms. (At
    this size the dispatch takes the tiled path — the flat phase-3 is
    gated to n1 >= 1024 by Mosaic's shape-cast support and is
    chip-verified by `tasks.py chipcheck`; in interpret mode both paths
    share the stage-1/2 math pinned here.)"""
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_rfft
    n = 1 << 14
    x = rng.standard_normal(n).astype(np.float32)
    yr, yi = fused_multilevel_rfft(jnp.asarray(x), n, interpret=True)
    assert np.asarray(yr).shape == (n // 2 + 1,)
    ref = np.fft.rfft(x.astype(np.float64))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert snr_db(ref, got) > 120.0
    # Nyquist bin specifically (the tail-step write)
    assert abs(got[n // 2] - ref[n // 2]) < 1e-2 * max(1.0, abs(ref[n // 2]))
    # the (1, n) rank-2 form rides the tiled path and must agree exactly
    # in shape and to f32 tolerance in value
    yr2, yi2 = fused_multilevel_rfft(jnp.asarray(x[None]), n,
                                     interpret=True)
    assert np.asarray(yr2).shape == (1, n // 2 + 1)
    assert snr_db(got, np.asarray(yr2)[0] + 1j * np.asarray(yi2)[0]) > 120.0


def test_phased_flat_complex_rank1_parity(rng):
    """The rank-1 flat phased COMPLEX kernel (phase-3 natural-order
    (n,) emission, r3) matches numpy and the rank-2 tiled path."""
    from kofft_tpu.ops.pallas_kernels import fused_multilevel_fft
    n = 1 << 14
    xr = rng.standard_normal(n).astype(np.float32)
    xi = rng.standard_normal(n).astype(np.float32)
    yr, yi = fused_multilevel_fft(jnp.asarray(xr), jnp.asarray(xi), n,
                                  interpret=True)
    assert np.asarray(yr).shape == (n,)
    ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    got = np.asarray(yr) + 1j * np.asarray(yi)
    assert snr_db(ref, got) > 120.0
    yr2, yi2 = fused_multilevel_fft(jnp.asarray(xr[None]),
                                    jnp.asarray(xi[None]), n,
                                    interpret=True)
    assert np.asarray(yr2).shape == (1, n)
    assert snr_db(got, np.asarray(yr2)[0] + 1j * np.asarray(yi2)[0]) > 120.0


def test_phased_flat_complex_batched_parity(rng):
    """Batched complex flat mode (r4): the rank-1 (b*n,) phase-3 output
    with block index b_*ph3 + p matches numpy per row and the b == 1
    flat form bit-for-bit on row 0. This is the kernel form that closes
    the batched-vs-single per-row gap (VERDICT r3 next #1): every
    output block keeps the sublane-dense 1-D layout."""
    from kofft_tpu.ops.pallas_kernels import _build_phased, _pow2_split
    n = 1 << 14
    b = 4
    n1, n2 = _pow2_split(n)
    xr = rng.standard_normal((b, n)).astype(np.float32)
    xi = rng.standard_normal((b, n)).astype(np.float32)
    run = _build_phased(n, "float32", True, "highest", flat=True)
    yr, yi = run(b, jnp.asarray(xr.reshape(b, n1, n2)),
                 jnp.asarray(xi.reshape(b, n1, n2)))
    # n1 = 128 here, so the r5 rank-2 flat form applies: (rows, 128)
    # blocks whose row-major flatten is the same (b*n,) stream
    assert np.asarray(yr).size == b * n
    got = (np.asarray(yr).reshape(b, n)
           + 1j * np.asarray(yi).reshape(b, n))
    ref = np.fft.fft(xr.astype(np.complex128) + 1j * xi, axis=-1)
    for r in range(b):
        assert snr_db(ref[r], got[r]) > 120.0
    y1r, y1i = run(1, jnp.asarray(xr[:1].reshape(1, n1, n2)),
                   jnp.asarray(xi[:1].reshape(1, n1, n2)))
    np.testing.assert_array_equal(np.asarray(y1r).reshape(n),
                                  np.asarray(yr).reshape(b, n)[0])
    np.testing.assert_array_equal(np.asarray(y1i).reshape(n),
                                  np.asarray(yi).reshape(b, n)[0])


def test_smooth_split_and_parity(rng):
    """Smooth odd*2^k sizes ride the phased kernel (r3): the odd factor
    lives in n1 and the in-kernel recursion bottoms at odd*2^c <= 32 DFT
    leaves (reference mixed-radix hot-path parity, src/fft.rs:1573-1706).
    Measured on chip: 3*2^18 149.3 us vs the XLA tree's 163.1; 5*2^16
    61.4 vs 71.1."""
    from kofft_tpu.ops.pallas_kernels import (_ml_split, _pow2_split,
                                              fused_multilevel_fft,
                                              fused_multilevel_rfft)
    assert _pow2_split(3 << 18) == (768, 1024)
    assert _pow2_split(5 << 16) == (640, 512)
    assert _pow2_split(10 ** 6) is None          # odd part 5^6 > 31
    assert _pow2_split(3 << 4) is None           # too small
    # the recursion reaches a <= 32 leaf for every smooth n1
    for m in (384, 640, 768, 896, 1920, 3072):
        while m > 32:
            a, b = _ml_split(m)
            assert a * b == m and a >= 2
            m = b
    for n in (3 << 14, 5 << 14):
        xr = rng.standard_normal(n).astype(np.float32)
        xi = rng.standard_normal(n).astype(np.float32)
        yr, yi = fused_multilevel_fft(jnp.asarray(xr), jnp.asarray(xi), n,
                                      interpret=True)
        ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
        assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 120.0
        hr, hi = fused_multilevel_rfft(jnp.asarray(xr), n, interpret=True)
        assert snr_db(np.fft.rfft(xr.astype(np.float64)),
                      np.asarray(hr) + 1j * np.asarray(hi)) > 120.0


def test_dft_primitive_ad_rules_trace(rng):
    """Mirror of the rdft trace test for the complex-planes primitive:
    jvp (tangents ride the same transform), transpose (conjugate
    direction), and batching rules all trace with consistent shapes."""
    from kofft_tpu.ops.pallas_fft import pallas_fft_planes
    n = 1 << 14
    x = jax.ShapeDtypeStruct((3, n), jnp.float32)

    out = jax.eval_shape(lambda a, b: pallas_fft_planes(a, b, n, False),
                         x, x)
    assert tuple(out[0].shape) == (3, n)

    # inverse direction binds with inverse=True
    outi = jax.eval_shape(lambda a, b: pallas_fft_planes(a, b, n, True),
                          x, x)
    assert tuple(outi[1].shape) == (3, n)

    # jvp, including a symbolic-zero tangent on the imaginary plane
    o, to = jax.eval_shape(
        lambda a, b, da: jax.jvp(
            lambda u, v: pallas_fft_planes(u, v, n, False),
            (a, b), (da, jnp.zeros((3, n), jnp.float32))), x, x, x)
    assert tuple(to[0].shape) == (3, n)

    # vjp/transpose: cotangents pull back through the inverse direction
    def vjp_shape(a, b, cr, ci):
        _, pull = jax.vjp(lambda u, v: pallas_fft_planes(u, v, n, False),
                          a, b)
        return pull([cr, ci])
    xbar = jax.eval_shape(vjp_shape, x, x, x, x)
    assert tuple(xbar[0].shape) == (3, n)
    assert tuple(xbar[1].shape) == (3, n)

    # batching over a new leading dim; one operand broadcast
    vx = jax.ShapeDtypeStruct((5, 3, n), jnp.float32)
    vout = jax.eval_shape(
        jax.vmap(lambda a: pallas_fft_planes(a, jnp.zeros((3, n),
                                                          jnp.float32),
                                             n, False)), vx)
    assert tuple(vout[0].shape) == (5, 3, n)


def test_pallas_supported_env_disable(monkeypatch):
    """KOFFT_TPU_DISABLE_PALLAS_FFT=1 forces the XLA path on any
    platform (the reference's feature-gate escape hatch)."""
    from kofft_tpu.ops.pallas_fft import pallas_supported
    monkeypatch.setenv("KOFFT_TPU_DISABLE_PALLAS_FFT", "1")
    assert not pallas_supported(1 << 20, "float32")
    monkeypatch.delenv("KOFFT_TPU_DISABLE_PALLAS_FFT")
    # off-TPU still false; the dtype gate rejects f64 regardless
    assert not pallas_supported(1 << 20, "float64")


def test_fused_nd_zone_table():
    from kofft_tpu.ops.pallas_kernels import fused_nd_zone
    assert fused_nd_zone((128, 128, 128), (0, 1, 2))
    assert fused_nd_zone((512, 512), (0, 1))
    assert fused_nd_zone((512, 256), (0, 1))
    assert fused_nd_zone((512, 256), (1, -2))         # axis aliases
    assert not fused_nd_zone((256, 256), (0, 1))      # below min points
    assert not fused_nd_zone((1024, 1024), (0, 1))    # dense 1024 loses
    assert not fused_nd_zone((64, 64, 64), (0, 1, 2))  # Mosaic crash gate
    assert not fused_nd_zone((256, 256, 128), (0, 1, 2))  # VMEM budget
    assert not fused_nd_zone((512, 512), (0,))        # partial axes
    assert not fused_nd_zone((512, 384), (0, 1))      # non-pow2 axis


def test_fused_nd_parity_interpret(rng):
    """One-call all-axes kernel vs the f64 oracle (forward + inverse
    roundtrip) at an in-zone rank-2 shape."""
    from kofft_tpu.ops.pallas_kernels import fused_ndfft_planes
    shape = (512, 256)
    xr = rng.standard_normal(shape).astype(np.float32)
    xi = rng.standard_normal(shape).astype(np.float32)
    yr, yi = fused_ndfft_planes(jnp.asarray(xr), jnp.asarray(xi),
                                interpret=True)
    ref = np.fft.fftn(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0
    br, bi = fused_ndfft_planes(yr, yi, inverse=True, interpret=True)
    n = shape[0] * shape[1]
    got = (np.asarray(br) + 1j * np.asarray(bi)) / n
    assert snr_db(xr.astype(np.float64) + 1j * xi.astype(np.float64),
                  got) > 100.0


def test_fused_nd_parity_interpret_3d(rng):
    from kofft_tpu.ops.pallas_kernels import fused_ndfft_planes
    shape = (128, 128, 128)
    xr = rng.standard_normal(shape).astype(np.float32)
    xi = rng.standard_normal(shape).astype(np.float32)
    yr, yi = fused_ndfft_planes(jnp.asarray(xr), jnp.asarray(xi),
                                interpret=True)
    ref = np.fft.fftn(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    assert snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi)) > 100.0


def test_tiled_pipeline_parity_interpret(rng):
    """phased_tiled_fft: tiled (b, m, m) planes in/out, flat row-major
    = 1-D order on both ends; batched rows ride the (b, phases) grid or
    the batch-folded two-call kernels (the lax.scan restructure is a
    recorded negative result — exp_batch_scan.py)."""
    from kofft_tpu.ops.pallas_kernels import phased_tiled_fft
    m = 128
    n = m * m
    x = (rng.standard_normal((3, n)) + 1j * rng.standard_normal((3, n))
         ).astype(np.complex64)
    ar = jnp.asarray(np.ascontiguousarray(x.real).reshape(3, m, m))
    ai = jnp.asarray(np.ascontiguousarray(x.imag).reshape(3, m, m))
    yr, yi = phased_tiled_fft(ar, ai, interpret=True)
    got = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(3, n)
    assert snr_db(np.fft.fft(x.astype(np.complex128)), got) > 100.0


def test_tiled_batch_folded_branch_interpret(rng):
    """b=4 at m=128 folds batch rows (bt > 1) onto the two-call kernels
    inside phased_tiled_fft — same (b, m, m) output contract."""
    from kofft_tpu.ops.pallas_kernels import phased_tiled_fft
    m = 128
    n = m * m
    x = (rng.standard_normal((4, n)) + 1j * rng.standard_normal((4, n))
         ).astype(np.complex64)
    ar = jnp.asarray(np.ascontiguousarray(x.real).reshape(4, m, m))
    ai = jnp.asarray(np.ascontiguousarray(x.imag).reshape(4, m, m))
    yr, yi = phased_tiled_fft(ar, ai, interpret=True)
    got = (np.asarray(yr) + 1j * np.asarray(yi)).reshape(4, n)
    assert snr_db(np.fft.fft(x.astype(np.complex128)), got) > 100.0


def test_bf16_io_phased_parity_interpret(rng):
    """bfloat16 plane I/O (half HBM traffic, the batched-throughput
    form): same phased kernel, bf16 blocks in/out, f32 compute inside.
    SNR floor is the bf16 quantization of input+output (~35-45 dB on
    white data), dtype contract bf16 in -> bf16 out."""
    from kofft_tpu.ops.pallas_kernels import _pow2_split, _build_phased
    n = 1 << 14
    n1, n2 = _pow2_split(n)
    xr = rng.standard_normal((2, n)).astype(np.float32)
    xi = rng.standard_normal((2, n)).astype(np.float32)
    run = _build_phased(n, "float32", True, "highest", io="bfloat16")
    ar = jnp.asarray(xr.reshape(2, n1, n2), jnp.bfloat16)
    ai = jnp.asarray(xi.reshape(2, n1, n2), jnp.bfloat16)
    yr, yi = run(2, ar, ai)
    assert yr.dtype == jnp.bfloat16 and yi.dtype == jnp.bfloat16
    got = (np.asarray(yr, np.float64)
           + 1j * np.asarray(yi, np.float64)).reshape(2, n)
    ref = np.fft.fft(xr.astype(np.float64) + 1j * xi.astype(np.float64))
    s = snr_db(ref, got)
    assert 30.0 < s < 80.0, s


def test_bf16_io_entry_and_fallback(rng):
    """fused_multilevel_fft / fused_multilevel_rfft accept bf16 planes:
    served shapes ride the bf16-I/O phased grid; unserved shapes (small
    n with batch folding) upcast to the f32 kernels and round back —
    both keep the bf16 in/out dtype contract."""
    from kofft_tpu.ops.pallas_kernels import (fused_multilevel_fft,
                                              fused_multilevel_rfft)
    n = 1 << 14
    x = rng.standard_normal((n,)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    yr, yi = fused_multilevel_fft(xb, jnp.zeros_like(xb), n,
                                  interpret=True)
    assert yr.dtype == jnp.bfloat16
    ref = np.fft.fft(x.astype(np.float64))
    s = snr_db(ref, np.asarray(yr, np.float64)
               + 1j * np.asarray(yi, np.float64))
    assert s > 30.0, s
    # batch-folded small shape -> upcast fallback (bt > 1)
    xb8 = jnp.asarray(rng.standard_normal((8, n)).astype(np.float32),
                      jnp.bfloat16)
    yr8, yi8 = fused_multilevel_fft(xb8, jnp.zeros_like(xb8), n,
                                    interpret=True)
    assert yr8.dtype == jnp.bfloat16 and yr8.shape == (8, n)
    # real path
    hr, hi = fused_multilevel_rfft(xb, n, interpret=True)
    assert hr.dtype == jnp.bfloat16 and hr.shape == (n // 2 + 1,)
    sref = np.fft.rfft(x.astype(np.float64))
    s2 = snr_db(sref, np.asarray(hr, np.float64)
                + 1j * np.asarray(hi, np.float64))
    assert s2 > 30.0, s2


def test_bf16_engine_fallback_off_tpu(rng):
    """Off-TPU (no pallas), bf16 planes upcast to the f32 XLA engine and
    round back — public fft_split keeps the dtype contract everywhere."""
    import kofft_tpu as kt
    n = 2048
    x = rng.standard_normal((3, n)).astype(np.float32)
    xb = jnp.asarray(x, jnp.bfloat16)
    yr, yi = kt.fft_split(xb, jnp.zeros_like(xb))
    assert yr.dtype == jnp.bfloat16
    ref = np.fft.fft(x.astype(np.float64))
    s = snr_db(ref, np.asarray(yr, np.float64)
               + 1j * np.asarray(yi, np.float64))
    assert s > 30.0, s
    from kofft_tpu.ops.rfft import rfft_split
    hr, hi = rfft_split(xb)
    assert hr.dtype == jnp.bfloat16 and hr.shape == (3, n // 2 + 1)


def test_phased_rows_fold_parity_interpret(rng):
    """rows=2 batch fold of the phased grid (exp_batch3.py: -2.7%/-8%
    per row at highest/default on chip): identical transform for the
    complex and real variants, and the _phased_rows policy gates."""
    from kofft_tpu.ops.pallas_kernels import (_build_phased, _phased_rows,
                                              _pow2_split)
    n = 1 << 14
    n1, n2 = _pow2_split(n)
    b = 4
    ar = rng.standard_normal((b, n1, n2)).astype(np.float32)
    ai = rng.standard_normal((b, n1, n2)).astype(np.float32)
    ref = np.fft.fft((ar + 1j * ai).reshape(b, n).astype(np.complex128))
    br, bi = _build_phased(n, "float32", True, "highest")(
        b, jnp.asarray(ar), jnp.asarray(ai))
    fr, fi = _build_phased(n, "float32", True, "highest", rows=2)(
        b, jnp.asarray(ar), jnp.asarray(ai))
    got = (np.asarray(fr, np.float64)
           + 1j * np.asarray(fi, np.float64)).reshape(b, n)
    assert snr_db(ref, got) > 100.0
    # the fold only regroups the grid; per-row math is identical
    np.testing.assert_allclose(np.asarray(fr), np.asarray(br),
                               rtol=1e-6, atol=1e-5)
    np.testing.assert_allclose(np.asarray(fi), np.asarray(bi),
                               rtol=1e-6, atol=1e-5)
    # real variant: one-sided rows + per-row Nyquist tiles
    x = rng.standard_normal((b, n1, n2)).astype(np.float32)
    refr = np.fft.rfft(x.reshape(b, n).astype(np.float64))
    hr, hi, c0r, c0i = _build_phased(n, "float32", True, "highest",
                                     real=True, rows=2)(b, jnp.asarray(x))
    signs = np.where(np.arange(n2) % 2 == 0, 1.0, -1.0)
    nr = (np.asarray(c0r, np.float64)[:, 0, :] * signs).sum(-1)
    ni = (np.asarray(c0i, np.float64)[:, 0, :] * signs).sum(-1)
    goth = np.concatenate(
        [np.asarray(hr, np.float64).reshape(b, n // 2)
         + 1j * np.asarray(hi, np.float64).reshape(b, n // 2),
         (nr + 1j * ni)[:, None]], axis=-1)
    assert snr_db(refr, goth) > 100.0
    # fold policy: even batches of phased-served sizes fold by 2; odd
    # batches, single transforms and 2^22+ (scratch = rows * 2n * 4 B)
    # stay unfolded
    assert _phased_rows(1 << 20, 8) == 2
    assert _phased_rows(1 << 20, 1) == 1
    assert _phased_rows(1 << 20, 7) == 1
    assert _phased_rows(1 << 22, 8) == 1


def test_phased_cap_is_per_tier():
    """_use_phased: the one-call kernel serves up to 2^22 on the 6-pass
    tiers and TWO octaves further (2^23 f32 scratch, 2^24 bf16 scratch —
    r5) on the HBM-bound 1-pass default tier. bt > 1 always rides the
    two-call kernels."""
    from kofft_tpu.config import set_precision
    from kofft_tpu.ops.pallas_kernels import _phased_sdt, _use_phased
    try:
        assert _use_phased(1 << 22, 1)
        assert not _use_phased(1 << 23, 1)
        assert not _use_phased(1 << 22, 2)
        set_precision("default")
        assert _use_phased(1 << 23, 1)
        assert _use_phased(1 << 24, 1)
        assert not _use_phased(1 << 25, 1)
        # the 2^24 octave only fits with the bf16 C-scratch
        assert _phased_sdt(1 << 24, "default", False) == "bfloat16"
        assert _phased_sdt(1 << 23, "default", False) == "float32"
        assert _phased_sdt(1 << 24, "highest", False) == "float32"
        assert _phased_sdt(1 << 24, "default", True) == "float32"
        set_precision("high")       # costs like highest: 2^22 cap
        assert not _use_phased(1 << 23, 1)
    finally:
        set_precision(None)


def test_leaf128_line_decomposition():
    """The leaf-128 change (r4): lines <= 1024 decompose exactly as at
    leaf-32 era ((32, 32) for 1024 — the 2^20 headline path is
    untouched), while 2048/4096/8192 lines bottom out in two dense
    levels; leaf tables stay within the [16, 128] MXU-friendly band."""
    from kofft_tpu.ops.pallas_kernels import _ML_LEAF, _ml_split

    def levels(m):
        out = []

        def walk(mm):
            if mm <= _ML_LEAF:
                out.append(mm)
                return
            a, b = _ml_split(mm)
            walk(a)
            walk(b)

        walk(m)
        return out

    assert _ML_LEAF == 128
    assert levels(1024) == [32, 32]
    assert levels(512) == [16, 32]
    assert levels(2048) == [32, 64]
    assert levels(4096) == [64, 64]
    assert levels(8192) == [64, 128]
    # smooth lines keep their odd*2^c leaves, now allowed up to 128
    assert all(v <= 128 for v in levels(3 * 1024))
    assert all(v <= 128 for v in levels(5 * 512))


def test_phased_wide_rows_parity_interpret(rng):
    """The r5 wide-dot rows fuse (one (n1, rows*t) line FFT per grid
    step instead of a Python loop of narrow calls) must match the
    narrow form bit-for-contract: complex and real variants."""
    import jax.numpy as jnp
    from kofft_tpu.ops.pallas_kernels import _build_phased, _pow2_split
    n = 1 << 14
    n1, n2 = _pow2_split(n)
    b = 4
    ar = rng.standard_normal((b, n1, n2)).astype(np.float32)
    ai = rng.standard_normal((b, n1, n2)).astype(np.float32)
    ref = np.fft.fft(ar.reshape(b, n).astype(np.float64)
                     + 1j * ai.reshape(b, n).astype(np.float64))
    for rows in (2, 4):
        run = _build_phased(n, "float32", True, "highest", rows=rows,
                            wide=True)
        yr, yi = run(b, jnp.asarray(ar), jnp.asarray(ai))
        got = (np.asarray(yr, np.float64)
               + 1j * np.asarray(yi, np.float64)).reshape(b, n)
        assert snr_db(ref, got) > 100.0, rows
    # real wide: one-sided halves + Nyquist row outputs
    x = rng.standard_normal((b, n1, n2)).astype(np.float32)
    rref = np.fft.rfft(x.reshape(b, n).astype(np.float64))
    run = _build_phased(n, "float32", True, "highest", real=True,
                        rows=2, wide=True)
    hr, hi, c0r, c0i = run(b, jnp.asarray(x))
    signs = np.where(np.arange(n2) % 2 == 0, 1.0, -1.0).astype(np.float32)
    nr = (np.asarray(c0r)[:, 0, :] * signs).sum(-1)[:, None]
    ni = (np.asarray(c0i)[:, 0, :] * signs).sum(-1)[:, None]
    got = (np.concatenate(
        [np.asarray(hr, np.float64).reshape(b, n // 2), nr], -1)
        + 1j * np.concatenate(
            [np.asarray(hi, np.float64).reshape(b, n // 2), ni], -1))
    assert snr_db(rref, got) > 100.0


def test_fft2_bt_fold_parity_interpret(rng):
    """bt-folded 2-D kernel (r5, small-image form): 8 slabs per grid
    step as wide line FFTs must equal per-slab 2-D FFTs."""
    import jax.numpy as jnp
    from kofft_tpu.ops.pallas_kernels import _build_fft2
    m, b = 128, 8
    ar = rng.standard_normal((b, m, m)).astype(np.float32)
    ai = rng.standard_normal((b, m, m)).astype(np.float32)
    run = _build_fft2(m, m, "float32", True, "highest", bt=4)
    yr, yi = run(b, jnp.asarray(ar), jnp.asarray(ai))
    ref = np.fft.fft2(ar.astype(np.float64) + 1j * ai.astype(np.float64))
    got = np.asarray(yr, np.float64) + 1j * np.asarray(yi, np.float64)
    assert snr_db(ref, got) > 100.0


def test_two_call_bf16_c_intermediate_interpret(rng):
    """bf16 inter-stage C (default-tier traffic cut, r5): the pair must
    stay within the bf16 quantization floor of the f32 result and emit
    f32 outputs; rfft variant's one-sided shape contract holds."""
    import jax.numpy as jnp
    from kofft_tpu.ops.pallas_kernels import _build_ml, _pow2_split
    n = 1 << 14
    n1, n2 = _pow2_split(n)
    ar = rng.standard_normal((1, n1, n2)).astype(np.float32)
    ai = rng.standard_normal((1, n1, n2)).astype(np.float32)
    ref = np.fft.fft(ar.reshape(1, n).astype(np.float64)
                     + 1j * ai.reshape(1, n).astype(np.float64))
    _, _, s1, _, s2, _ = _build_ml.__wrapped__(
        n, "float32", True, "default", 1, 128, "bfloat16")
    cr, ci = s1(1, jnp.asarray(ar), jnp.asarray(ai))
    assert str(cr.dtype) == "bfloat16"
    yr, yi = s2(1, cr, ci)
    assert str(yr.dtype) == "float32"
    got = (np.asarray(yr, np.float64)
           + 1j * np.asarray(yi, np.float64)).reshape(1, n)
    # interpret-mode 'default' dots are exact f32, so the only error is
    # the bf16 C quantization (~50 dB at this size)
    assert snr_db(ref, got) > 45.0
    _, _, _, s1r, _, s2h = _build_ml.__wrapped__(
        n, "float32", True, "default", 1, 128, "bfloat16")
    x = rng.standard_normal((1, n1, n2)).astype(np.float32)
    cr, ci = s1r(1, jnp.asarray(x))
    hr, hi = s2h(1, cr, ci)
    assert hr.shape == (1, n2 // 2, n1) and str(hr.dtype) == "float32"


def test_phased_bf16_scratch_parity_interpret(rng):
    """bf16 C-scratch (the r5 lever that fits 2^24 in the one-call
    kernel on the default tier): parity within the bf16 quantization
    floor, f32 outputs. Routed on chip only (_phased_sdt gates
    interpret to f32), so this drives the builder directly."""
    import jax.numpy as jnp
    from kofft_tpu.ops.pallas_kernels import _build_phased, _pow2_split
    n = 1 << 14
    n1, n2 = _pow2_split(n)
    ar = rng.standard_normal((1, n1, n2)).astype(np.float32)
    ai = rng.standard_normal((1, n1, n2)).astype(np.float32)
    ref = np.fft.fft(ar.reshape(1, n).astype(np.float64)
                     + 1j * ai.reshape(1, n).astype(np.float64))
    run = _build_phased(n, "float32", True, "default", sdt="bfloat16")
    yr, yi = run(1, jnp.asarray(ar), jnp.asarray(ai))
    assert str(yr.dtype) == "float32"
    got = (np.asarray(yr, np.float64)
           + 1j * np.asarray(yi, np.float64)).reshape(1, n)
    # interpret-mode 'default' dots are exact f32: the only error is
    # the bf16 scratch quantization (~50 dB at this size)
    assert snr_db(ref, got) > 45.0
    # real variant (tiled real path is what serves 2^24 default rfft)
    x = rng.standard_normal((1, n1, n2)).astype(np.float32)
    rref = np.fft.rfft(x.reshape(1, n).astype(np.float64))
    run = _build_phased(n, "float32", True, "default", real=True,
                        sdt="bfloat16")
    hr, hi, c0r, c0i = run(1, jnp.asarray(x))
    signs = np.where(np.arange(n2) % 2 == 0, 1.0, -1.0)
    nr = (np.asarray(c0r, np.float64)[:, 0, :] * signs).sum(-1)[:, None]
    ni = (np.asarray(c0i, np.float64)[:, 0, :] * signs).sum(-1)[:, None]
    got = (np.concatenate(
        [np.asarray(hr, np.float64).reshape(1, n // 2), nr], -1)
        + 1j * np.concatenate(
            [np.asarray(hi, np.float64).reshape(1, n // 2), ni], -1))
    assert snr_db(rref, got) > 45.0
