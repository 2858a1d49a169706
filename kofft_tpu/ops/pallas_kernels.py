"""Pallas TPU kernels for the FFT hot path.

Fused four-step FFT for pow2 n = n1 * n2 (n1, n2 >= 128):

    stage A:  C[k1, j2] = (sum_j1 F1[j1, k1] * A[j1, j2]) * W[k1, j2]
    stage B:  X[k2, k1] =  sum_j2 F2[j2, k2] * C[k1, j2]

Each stage is one pallas_call: the (n1, n2) data planes stay resident in
VMEM across the tile grid (their block index is constant in the tile
dimension), the DFT-matrix tile streams through, the twiddle multiply is
fused into stage A's epilogue, and both contractions are laid out so the
natural dot_general output needs no in-kernel transpose. Compared with the
XLA matmul path this removes the twiddle and transpose HBM round-trips —
the profiled bottleneck (the engine is memory-bound; see bench history).

The flat output is X.reshape(n) with index k2*n1 + k1 — identical math to
``kofft_tpu.ops.fft._apply_tree`` (single-level), which remains the
fallback and the parity oracle. Inverse reuses the forward kernel via the
conjugation identity in ``pallas_fft.pallas_fft_planes``.

Measured design notes (v5e, 2^20 c32, chained-dependency timing)
-----------------------------------------------------------------
* Complex matmuls use the 3-multiply Gauss/Karatsuba form at HIGHEST
  precision: 18 MXU passes per level instead of 24, 288 -> 230 us end to
  end at unchanged SNR (135 dB vs f64).
* r2 stage decomposition (final, clean isolated probes): per grid step
  (0.5 MB block) a stage costs ~7.6 us of leaf DOTS (dots-only kernel:
  60.2 us/stage at HIGHEST), ~1.5 us of level-reshape/swap structure
  (skeleton replica: 11.7 us/stage) and ~0.5 us of twiddle broadcast —
  the stage is ~75% MXU-dot-bound. The dot cost is MAC-slot-bound at
  effective k=128: kron-lifting leaves to k=128 with 4x fewer streamed
  columns measures the SAME (63.6 vs 60.2 us, clean r2 re-probe) — the
  r1 kron negative stands. Only precision cuts the dot floor
  ('default'/3-pass: -23 us/stage at 47 dB). An earlier r2 monkeypatch
  probe ("relayout-bound, 70.5 us without dots") did not survive
  replication and is superseded by these numbers.
* Composed two-stage transforms pay ~15-60 us over the isolated stage
  sum: intermediates BETWEEN pallas calls materialize for real even
  when chained-loop carries ride VMEM (see memory notes / experiment
  scripts under benchmarks/).
* A full-MXU-width variant (residual factors r < 128 lifted to dense
  128-contractions via kron(F_r, I_{128/r}) block matmuls — index-free
  reshapes, no transposes) was built and measured SLOWER (344 vs 312 us):
  the lift adds the same relayout class it tries to avoid. Balanced
  32x32 leaves win; recorded here so it is not repeated.
* 'high' precision (manual bf16x3 hi/lo, 12 DEFAULT passes — Mosaic has
  no native HIGH dot lowering) measures the SAME as highest (80.7 vs
  80.3 us/stage, r2 re-measurement): with passes at 1.55 us the 6-pass
  saving drowns in the split overhead. It remains only for API parity.
  'default' (3 passes) saves ~23 us/stage at 47 dB — throughput tier.
"""

from __future__ import annotations

import functools

import jax
import jax.numpy as jnp
import numpy as np

from ..config import get_config
from ..plan import tables

_TILE = 128
_MAX_N = 1 << 26          # per-step VMEM is tile-bound: n1 * TILE planes
                          # (above 2^24 the split grows n1 so stage-2
                          # (t, n2) blocks stay <= 4 MB — see _pow2_split)
_MIN_FACTOR = _TILE       # both factors must tile cleanly


_MAX_ODD = 23             # n1 = odd*128 must stay under the 3072 line cap


def _pow2_split(n: int):
    """n = n1 * n2 for SMOOTH n = o * 2^k (odd o <= 23), both factors
    divisible by the 128 tile, n2 a power of two; None otherwise.

    Pow2 n: n1 is the balanced power of two capped at 2048 (at 2^24 the
    (2048, 8192) split measures 14% faster than balanced (4096, 4096) —
    stage-1 VMEM pressure grows with n1 while stage 2 tolerates long
    rows). At 2^22 the balanced (2048, 2048) was re-probed against
    (1024, 4096) and (512, 8192) on the phased kernel (r3): balanced
    wins by 10-15% — longer n2 lines add leaf levels faster than the
    shorter stage-1 saves; do not retry. Smooth non-pow2 n (r3): the odd factor lives in n1 (the
    stage-1 line length), whose in-kernel recursion bottoms out at an
    odd*2^c <= 32 DFT leaf — so 3*2^18, 5*2^16, 10^6-adjacent sizes ride
    the same one-pass phased kernel instead of the XLA matmul tree
    (reference mixed-radix hot-path parity, src/fft.rs:1573-1706)."""
    if n < _MIN_FACTOR * _MIN_FACTOR or n > _MAX_N:
        return None
    tz = (n & -n).bit_length() - 1
    o = n >> tz
    if o == 1:
        k = n.bit_length() - 1
        n1 = 1 << (k // 2)
        if n <= (1 << 23):
            # the r3 leaf-32-era preference (n1 capped at 2048, longer
            # n2) still holds through 2^23 at leaf-128
            n1 = min(n1, 2048)
        # 2^24+: balanced/short-n2 splits win and are REQUIRED — stage-2
        # blocks are (t, n2) / (n2, t) planes whose lane dims cannot
        # shrink below 128 (Mosaic block rule), so scoped VMEM grows
        # with n2: (2048, 8192) at 2^24 overflows the 100 MB budget by
        # 4.1 M with the bf16 scratch (measured, exp_sdt) and loses at
        # `highest` too (3490 vs 3344 us for (4096, 4096) — the r3
        # "14% for (2048, 8192)" preference predates leaf-128 and
        # REVERSED on re-probe, exp_p56). n2 caps at 8192 (2^25 ->
        # (4096, 8192), 2^26 -> (8192, 8192)) — this is what extends
        # the native pow2 range past the old 2^24 cliff (VERDICT r4
        # #6): twiddles were always streamed operands
        # (_twiddle_factors), never baked literals.
        n1 = max(n1, n // 8192)
        n2 = n // n1
        if n1 < _MIN_FACTOR or n2 < _MIN_FACTOR:
            return None
        return n1, n2
    if o > _MAX_ODD:
        return None
    # n1 = o * 2^a (a >= 7 so the 128 tile divides it), n2 = 2^(tz-a)
    # >= 128; choose the most balanced split with n1 capped at 3 * 2^10
    # and n2 capped at 8192 (the stage-2 block bound above)
    best = None
    for a in range(7, tz - 6):
        n1 = o << a
        n2 = 1 << (tz - a)
        if n1 > 3072:
            break
        if n2 > 8192:
            continue
        if best is None or abs(n1 - n2) < abs(best[0] - best[1]):
            best = (n1, n2)
    return best


def fused_four_step_supported(n: int) -> bool:
    return _pow2_split(n) is not None


def _kernel_precision() -> str:
    """Resolve the config precision to a kernel mode (see module notes)."""
    return get_config().precision


def _dot(a, b, dims, prec=None):
    p = jax.lax.Precision.HIGHEST if prec is None else prec
    return jax.lax.dot_general(a, b, dimension_numbers=(dims, ((), ())),
                               preferred_element_type=jnp.float32,
                               precision=p)


def _bf16x3_dot(u, v, dims):
    """Real dot at ~f32 fidelity from 3 single-pass bf16 MXU products
    (hi/lo split of both operands, the u_lo*v_lo term dropped) — the
    'high' mode; Mosaic has no native HIGH lowering for dot_general."""
    uh = u.astype(jnp.bfloat16)
    ul = (u - uh.astype(jnp.float32)).astype(jnp.bfloat16)
    vh = v.astype(jnp.bfloat16)
    vl = (v - vh.astype(jnp.float32)).astype(jnp.bfloat16)
    p = jax.lax.Precision.DEFAULT
    return (_dot(uh, vh, dims, p) + _dot(uh, vl, dims, p)
            + _dot(ul, vh, dims, p))


def _cdot(fr, fi, xr, xi, dims, mode: str):
    """Complex contraction (fr + i*fi) x (xr + i*xi) on the MXU.

    mode='highest'  Gauss/Karatsuba, 3 HIGHEST dots (default; ~f32-exact)
    mode='high'     manual bf16x3 (hi/lo split, 3 DEFAULT passes per dot)
    mode='default'  Gauss/Karatsuba, 3 single-pass bf16 dots (fast, ~47dB)
    """
    if mode == "high":
        rr = _bf16x3_dot(fr, xr, dims)
        ii = _bf16x3_dot(fi, xi, dims)
        ri = _bf16x3_dot(fr, xi, dims)
        ir = _bf16x3_dot(fi, xr, dims)
        return rr - ii, ri + ir
    p = (jax.lax.Precision.HIGHEST if mode == "highest"
         else jax.lax.Precision.DEFAULT)
    t1 = _dot(fr, xr, dims, p)
    t2 = _dot(fi, xi, dims, p)
    t3 = _dot(fr + fi, xr + xi, dims, p)
    return t1 - t2, t3 - t1 - t2


def _stage_a_kernel(mode, ar_ref, ai_ref, f1r_ref, f1i_ref, wr_ref, wi_ref,
                    cr_ref, ci_ref):
    """C[k1t, j2t] = (sum_j1 F1[j1, k1t] * A[j1, j2t]) * W[k1t, j2t] —
    contraction over j1 = axis 0 of both operands, so the tile output is
    (t1, t2) directly; twiddle fused in the epilogue."""
    ar = ar_ref[0]                      # (n1, t2)
    ai = ai_ref[0]
    br, bi = _cdot(f1r_ref[...], f1i_ref[...], ar, ai, ((0,), (0,)), mode)
    wr = wr_ref[...]                    # (t1, t2)
    wi = wi_ref[...]
    cr_ref[0] = br * wr - bi * wi
    ci_ref[0] = br * wi + bi * wr


def _stage_b_kernel(mode, cr_ref, ci_ref, f2r_ref, f2i_ref, xr_ref, xi_ref):
    """X[k2t, k1t] = sum_j2 F2[j2, k2t] * C[k1t, j2] — contracting F2
    axis 0 with C axis 1 yields (t2, t1): the transposed output layout
    (flat index k2*n1 + k1) for free."""
    cr = cr_ref[0]                      # (t1, n2)
    ci = ci_ref[0]
    xr_ref[0], xi_ref[0] = _cdot(f2r_ref[...], f2i_ref[...], cr, ci,
                                 ((0,), (1,)), mode)


@functools.lru_cache(maxsize=None)
def _build(n: int, dtype: str = "float32", interpret: bool = False,
           mode: str = "highest"):
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = _pow2_split(n)
    f1r, f1i = tables.dft_matrix(n1, dtype)     # (n1, n1), F[j1, k1]
    f2r, f2i = tables.dft_matrix(n2, dtype)     # (n2, n2), F[j2, k2]
    twr, twi = tables.twiddle(n1, n2, dtype)    # (n1, n2), W[k1, j2]

    t1 = min(_TILE, n1)
    t2 = min(_TILE, n2)

    def stage_a(b, ar, ai):
        # grid (batch, j2-tile, k1-tile); k1 innermost so the A block
        # (constant in k1) stays VMEM-resident while F1 tiles stream.
        grid = (b, n2 // t2, n1 // t1)
        data_spec = pl.BlockSpec((1, n1, t2), lambda i, j, k: (i, 0, j),
                                 memory_space=pltpu.VMEM)
        f_spec = pl.BlockSpec((n1, t1), lambda i, j, k: (0, k),
                              memory_space=pltpu.VMEM)
        w_spec = pl.BlockSpec((t1, t2), lambda i, j, k: (k, j),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, t1, t2), lambda i, j, k: (i, k, j),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_stage_a_kernel, mode),
            grid=grid,
            in_specs=[data_spec, data_spec, f_spec, f_spec, w_spec, w_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=8 * b * n1 * n1 * n2 + 6 * b * n1 * n2,
                bytes_accessed=(4 * 2 * b * n1 * n2 * 2
                                + 4 * 2 * (n1 * n1 + n1 * n2)),
                transcendentals=0),
            interpret=interpret,
        )(ar, ai, jnp.asarray(f1r), jnp.asarray(f1i), jnp.asarray(twr),
          jnp.asarray(twi))

    def stage_b(b, cr, ci):
        # grid (batch, k1-tile, k2-tile); k2 innermost keeps the C block
        # resident while F2 tiles stream. Output block (t2, t1) at
        # (k2, k1) gives the transposed global layout (b, n2, n1).
        grid = (b, n1 // t1, n2 // t2)
        data_spec = pl.BlockSpec((1, t1, n2), lambda i, j, k: (i, j, 0),
                                 memory_space=pltpu.VMEM)
        f_spec = pl.BlockSpec((n2, t2), lambda i, j, k: (0, k),
                              memory_space=pltpu.VMEM)
        out_spec = pl.BlockSpec((1, t2, t1), lambda i, j, k: (i, k, j),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            functools.partial(_stage_b_kernel, mode),
            grid=grid,
            in_specs=[data_spec, data_spec, f_spec, f_spec],
            out_specs=[out_spec, out_spec],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=8 * b * n2 * n2 * n1,
                bytes_accessed=(4 * 2 * b * n1 * n2 * 2
                                + 4 * 2 * n2 * n2),
                transcendentals=0),
            interpret=interpret,
        )(cr, ci, jnp.asarray(f2r), jnp.asarray(f2i))

    return n1, n2, stage_a, stage_b


def fused_four_step_fft(xr, xi, n: int, interpret: bool = False):
    """Forward unnormalized DFT on SoA planes via the fused kernels.
    Input (..., n) float32; output (..., n) planes. ``interpret`` runs the
    kernels in the Pallas interpreter (CPU test coverage)."""
    n1, n2, stage_a, stage_b = _build(n, str(xr.dtype), interpret,
                                      _kernel_precision())
    batch = xr.shape[:-1]
    b = 1
    for s in batch:
        b *= s
    ar = xr.reshape(b, n1, n2)
    ai = xi.reshape(b, n1, n2)
    cr, ci = stage_a(b, ar, ai)
    yr, yi = stage_b(b, cr, ci)
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


# ===========================================================================
# Multi-level fused kernel: each global stage transforms whole lines
# in VMEM with a recursive four-step over tiny DFT-matrix leaves (baked
# in-kernel constants), so the full transform is 2 HBM read+write passes —
# against the XLA tree's ~6+ materialized twiddle/transpose passes.
# ===========================================================================

# Leaf DFT size: the line recursion bottoms out at a dense (m, m)
# DFT-matrix dot once m <= _ML_LEAF. 128 (one full MXU contraction,
# 128 KB constant pair in VMEM) — raised from 32 in r4: the dot cost is
# operand-STREAMING-bound, not MAC-bound (kron-lift negative, r1/r2), so
# what matters is the LEVEL COUNT per line, and larger natural leaves
# remove whole twiddle+swap+dot passes. Lines <= 1024 decompose
# identically at 32 and 128 (1024 -> (32, 32)); the change bites at
# 2048 lines ([32, 8, 8] -> [32, 64]: 2^22 phased 759 -> 578 us
# HIGHEST, 367 -> 289 default), 4096 ([4 levels] -> [64, 64]) and 8192
# ([8, 8, 8, 16] -> [64, 128]: 2^24 two-call 3973 -> 2915 us HIGHEST,
# 2566 -> 1751 default, vs jnp.fft 3791). benchmarks/exp_leaf.py is
# the sweep record (leaf 64 ties 128 at 2^22, loses at 2^24).
_ML_LEAF = 128
_ML_TILE = 128    # lines per grid step (1 MB data blocks)


def _ml_split(m: int):
    """Split m = a * b toward <= _ML_LEAF leaves. Pow2 m splits
    balanced; smooth m with odd factor <= _MAX_ODD keeps it in b so the
    recursion bottoms out at an odd*2^c <= 32 DFT-matrix leaf (e.g.
    768 -> (16, 48) -> (4, 12): leaf DFT-12). Larger odd factors
    (r4, VERDICT r3 missing #1) take the most balanced divisor split —
    the recursion descends BOTH factors, so e.g. 1000 -> (25, 40) ->
    leaf 25 + (2, 20), and 5^6 -> (125, 125) -> (5, 25) twice."""
    tz = (m & -m).bit_length() - 1
    o = m >> tz
    if o == 1:
        k = m.bit_length() - 1
        a = 1 << (k // 2)
        return a, m // a
    if o <= _MAX_ODD:
        a = 1 << max(1, tz // 2)
        return a, m // a
    best = None
    for a in range(2, int(m ** 0.5) + 1):
        if m % a == 0:
            best = a                   # largest divisor <= sqrt(m)
    return best, m // best


def multilevel_supported(n: int) -> bool:
    return _pow2_split(n) is not None


def _ml_const_keys(m: int) -> list:
    """Ordered constant keys needed by the length-m in-kernel line FFT."""
    out = []

    def walk(mm):
        if mm <= _ML_LEAF:
            key = ("dft", mm)
            if key not in out:
                out.append(key)
            return
        a, b = _ml_split(mm)
        key = ("tw", a, b)
        if key not in out:
            out.append(key)
        walk(a)
        walk(b)

    walk(m)
    return out


def _ml_const_arrays(keys: list, dtype: str) -> list:
    arrs = []
    for key in keys:
        if key[0] == "dft":
            re, im = tables.dft_matrix(key[1], dtype)
        else:
            re, im = tables.twiddle(key[1], key[2], dtype)
        arrs += [re, im]
    return arrs


def _fft_axis0_traced(xr, xi, m: int, consts: dict, mode: str = "highest"):
    """FFT along axis 0 of (m, t) planes, traced inside a kernel.

    Recursive four-step: m = a*b, line index j = ja*b + jb; output flat
    index k = ka + a*kb — the same ordering as ``_apply_tree``. DFT and
    twiddle tables arrive as kernel operands via ``consts`` (Pallas
    forbids captured constants). ``xi=None`` means a real input (rfft
    stage 1): the first leaf level needs only 2 dots instead of 3 and the
    zero plane is never materialized."""
    if m <= _ML_LEAF:
        fr, fi = consts[("dft", m)]
        if xi is None:
            dims = ((0,), (0,))
            if mode == "high":
                return _bf16x3_dot(fr, xr, dims), _bf16x3_dot(fi, xr, dims)
            p = (jax.lax.Precision.HIGHEST if mode == "highest"
                 else jax.lax.Precision.DEFAULT)
            return _dot(fr, xr, dims, p), _dot(fi, xr, dims, p)
        # F[j, k] contracted over j with x axis0 -> (k, t)
        return _cdot(fr, fi, xr, xi, ((0,), (0,)), mode)
    a, b = _ml_split(m)
    t = xr.shape[-1]
    x3r = xr.reshape(a, b * t)
    x3i = None if xi is None else xi.reshape(a, b * t)
    yr, yi = _fft_axis0_traced(x3r, x3i, a, consts, mode)  # (ka, b*t)
    yr = yr.reshape(a, b, t)
    yi = yi.reshape(a, b, t)
    twr, twi = consts[("tw", a, b)]                  # (a, b) w_m^{ka*jb}
    cr = yr * twr[:, :, None] - yi * twi[:, :, None]
    ci = yr * twi[:, :, None] + yi * twr[:, :, None]
    cr = jnp.swapaxes(cr, 0, 1).reshape(b, a * t)    # (jb, ka, t)
    ci = jnp.swapaxes(ci, 0, 1).reshape(b, a * t)
    zr, zi = _fft_axis0_traced(cr, ci, b, consts, mode)    # (kb, a*t)
    # flat output (kb, ka, t) -> index k = ka + a*kb along axis0
    return zr.reshape(m, t), zi.reshape(m, t)


def _unpack_consts(keys, refs):
    """Kernel-side: rebuild the {key: (re, im)} table dict from the
    flattened constant-operand ref list (two planes per key)."""
    return {k: (refs[2 * i][...], refs[2 * i + 1][...])
            for i, k in enumerate(keys)}


def _const_vmem_specs(arrs):
    """Whole-array VMEM BlockSpecs for kernel constant operands (DFT and
    twiddle tables), pinned to block 0 at every grid step (the *_ index
    map accepts any grid arity)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu
    return [pl.BlockSpec(a.shape,
                         (lambda nd: lambda *_: (0,) * nd)(a.ndim),
                         memory_space=pltpu.VMEM) for a in arrs]


def _ml_batch_tile(b: int, n1: int, n2: int) -> int:
    """Batch rows folded into each grid block. For small transforms the
    natural (1, n1, t) block is tiny (64 KB at n=2^14) and the grid
    becomes launch/pipeline-bound — folding batch rows restores ~0.5 MB
    blocks (measured: batched 2^14 c32 6.5 -> 11+ Gpts/s). Powers of two
    only so the grid divides evenly."""
    t = min(_ML_TILE, n2)
    target = (1 << 19) // (n1 * t * 4)          # ~0.5 MB per plane block
    bt = 1
    while bt * 2 <= min(b, max(1, target)) and b % (bt * 2) == 0:
        bt *= 2
    return bt


def _twiddle_factors(n1: int, n2: int, t: int, dtype: str):
    """Factored four-step twiddle: W[k1, j*t + u] = col[k1, j] * base[k1, u]
    (exact in integer phase arithmetic; the f32 product adds <= 1 ulp).

    Replaces the materialized (n1, n2) twiddle plane pair — at 2^20 that
    operand alone was 8 MB of HBM read per batch row, ~20% of the kernel's
    total traffic; the factors are n1*t + n1*n2/t elements (~0.6 MB at
    2^20) and stay VMEM-resident across the grid."""
    def build():
        n = n1 * n2
        k1 = np.arange(n1, dtype=np.int64)
        u = np.arange(t, dtype=np.int64)
        j = np.arange(n2 // t, dtype=np.int64) * t
        ang_b = (-2.0 * np.pi / n) * np.mod(np.outer(k1, u), n).astype(
            np.float64)
        ang_c = (-2.0 * np.pi / n) * np.mod(np.outer(k1, j), n).astype(
            np.float64)
        return (np.cos(ang_b).astype(dtype), np.sin(ang_b).astype(dtype),
                np.cos(ang_c).astype(dtype), np.sin(ang_c).astype(dtype))

    return tables.custom(("twfac", n1, n2, t, dtype), build)


def _ml_compiler_kwargs(interpret: bool, n1: int, t: int, bt: int) -> dict:
    """Mosaic CompilerParams for the multilevel stages.

    The traced line-FFT's temporaries exceed Mosaic's conservative 16 MB
    scoped-vmem default once lines reach 2048 (2^22+ sizes) or blocks grow
    past the default tiling (wider tiles / folded batch rows); the
    physical budget is far higher (v5e: 128 MB). Removing this guard
    breaks the 2^22-2^24 sizes ON CHIP ONLY (commit b314492) — the
    off-chip regression test asserts this function's contract directly
    (tests/test_pallas.py::test_vmem_guard_*)."""
    if interpret or (n1 < 2048 and t <= 128 and bt <= 1):
        return {}
    from jax.experimental.pallas import tpu as pltpu
    return {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}


@functools.lru_cache(maxsize=None)
def _build_ml(n: int, dtype: str = "float32", interpret: bool = False,
              mode: str = "highest", bt: int = 1, tile: int = _ML_TILE,
              cdt: str = "float32"):
    """Two-call multilevel kernel pair. ``cdt`` is the HBM dtype of the
    inter-stage C matrix: 'bfloat16' halves the pair's middle read+write
    traffic (the biggest share of its 2-round-trip cost at 2^24+). Only
    the `default` tier routes it — its MXU dots round operands to bf16
    anyway, so the extra rounding stacks ~1 dB on the tier's ~44
    (in-kernel compute stays f32 either way; outputs stay ``dtype``)."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = _pow2_split(n)
    cdtype = jnp.dtype(cdt)
    t = min(tile, n1)      # t tiles n2 in stage 1 and n1 in stage 2
    # base (n1, t) + per-column-block (n1, n2/t) twiddle factors
    ebr, ebi, ecr, eci = _twiddle_factors(n1, n2, t, dtype)
    keys1 = _ml_const_keys(n1)
    keys2 = _ml_const_keys(n2)
    # numpy on purpose: this builder is lru_cached and may first run inside
    # a trace — caching jnp arrays would leak tracers (see plan._TableCache)
    consts1 = _ml_const_arrays(keys1, dtype)
    consts2 = _ml_const_arrays(keys2, dtype)

    def line_fft_cols(xr, xi, m, cd):
        # (bt, m, tc) -> FFT along axis 1 for every (batch, col). The
        # batch rows merge into the column dim via a *leading-dim*
        # swapaxes, which Mosaic relayouts hide under DMA.
        tc = xr.shape[-1]
        fr = jnp.swapaxes(xr, 0, 1).reshape(m, bt * tc)
        fi = None if xi is None else jnp.swapaxes(xi, 0, 1).reshape(
            m, bt * tc)
        yr, yi = _fft_axis0_traced(fr, fi, m, cd, mode)
        yr = jnp.swapaxes(yr.reshape(m, bt, tc), 0, 1)
        yi = jnp.swapaxes(yi.reshape(m, bt, tc), 0, 1)
        return yr, yi

    def _block_twiddle(br_ref, bi_ref, cr_ref, ci_ref):
        """(n1, t) twiddle block for this grid column, synthesized on the
        VPU from the factored tables (cheap: n1*t muls hidden under the
        stage's DMA) instead of read from HBM. The column factor table is
        a tiny VMEM-resident (n1, n2/t) constant; the grid step's column
        is a dynamic lane slice (Mosaic disallows 1-wide lane blocks)."""
        j = pl.program_id(1)
        # one-hot lane select (dynamic width-1 lane slices don't lower)
        tbl_r = cr_ref[...]                 # (n1, n2/t)
        tbl_i = ci_ref[...]
        lane = jax.lax.broadcasted_iota(jnp.int32, tbl_r.shape, 1)
        sel = (lane == j).astype(tbl_r.dtype)
        c_r = jnp.sum(tbl_r * sel, axis=1, keepdims=True)
        c_i = jnp.sum(tbl_i * sel, axis=1, keepdims=True)
        b_r = br_ref[...]                   # (n1, t) base block
        b_i = bi_ref[...]
        return c_r * b_r - c_i * b_i, c_r * b_i + c_i * b_r

    def _ld(v):
        # compute is always f32 in-kernel; bf16 blocks upcast on load
        return v if v.dtype == jnp.float32 else v.astype(jnp.float32)

    def s1_kernel(ar, ai, ebr_r, ebi_r, ecr_r, eci_r, *crefs):
        const_refs, (cr, ci) = crefs[:-2], crefs[-2:]
        cd = _unpack_consts(keys1, const_refs)
        # block (bt, n1, t): FFT each column (length n1), then twiddle
        yr, yi = line_fft_cols(_ld(ar[...]), _ld(ai[...]), n1, cd)
        w_r, w_i = _block_twiddle(ebr_r, ebi_r, ecr_r, eci_r)
        w_r = w_r[None]
        w_i = w_i[None]
        cr[...] = (yr * w_r - yi * w_i).astype(cdtype)
        ci[...] = (yr * w_i + yi * w_r).astype(cdtype)

    def s1r_kernel(ar, ebr_r, ebi_r, ecr_r, eci_r, *crefs):
        # real-input stage 1 (rfft): no imag plane crosses HBM
        const_refs, (cr, ci) = crefs[:-2], crefs[-2:]
        cd = _unpack_consts(keys1, const_refs)
        yr, yi = line_fft_cols(_ld(ar[...]), None, n1, cd)
        w_r, w_i = _block_twiddle(ebr_r, ebi_r, ecr_r, eci_r)
        w_r = w_r[None]
        w_i = w_i[None]
        cr[...] = (yr * w_r - yi * w_i).astype(cdtype)
        ci[...] = (yr * w_i + yi * w_r).astype(cdtype)

    def s2_kernel(cr, ci, *crefs):
        const_refs, (xr_o, xi_o) = crefs[:-2], crefs[-2:]
        cd = _unpack_consts(keys2, const_refs)
        # block (bt, t, n2): FFT each row -> emit transposed (bt, n2, t)
        br = jnp.transpose(_ld(cr[...]), (2, 0, 1)).reshape(n2, bt * t)
        bi = jnp.transpose(_ld(ci[...]), (2, 0, 1)).reshape(n2, bt * t)
        yr, yi = _fft_axis0_traced(br, bi, n2, cd, mode)
        xr_o[...] = jnp.swapaxes(yr.reshape(n2, bt, t), 0, 1)
        xi_o[...] = jnp.swapaxes(yi.reshape(n2, bt, t), 0, 1)

    def s2h_kernel(cr, ci, *crefs):
        # one-sided stage 2 (rfft): emit only rows k2 < n2/2 — flat output
        # indices k = k2*n1 + k1 < n/2; the Nyquist term (k2 = n2/2, k1 = 0)
        # is a cheap XLA epilogue over C's k1 = 0 row. Halves the write
        # traffic vs writing the full spectrum and slicing in XLA.
        const_refs, (xr_o, xi_o) = crefs[:-2], crefs[-2:]
        cd = _unpack_consts(keys2, const_refs)
        h = n2 // 2
        br = jnp.transpose(_ld(cr[...]), (2, 0, 1)).reshape(n2, bt * t)
        bi = jnp.transpose(_ld(ci[...]), (2, 0, 1)).reshape(n2, bt * t)
        yr, yi = _fft_axis0_traced(br, bi, n2, cd, mode)
        xr_o[...] = jnp.swapaxes(yr[:h].reshape(h, bt, t), 0, 1)
        xi_o[...] = jnp.swapaxes(yi[:h].reshape(h, bt, t), 0, 1)

    kw = _ml_compiler_kwargs(interpret, n1, t, bt)

    # twiddle factor specs: base block follows the grid column; the column
    # factor is a (n1, 1) slice of the tiny (n1, n2/t) table
    def _tw_specs():
        # both factor tables are grid-constant VMEM residents
        base = pl.BlockSpec((n1, t), lambda i, j: (0, 0),
                            memory_space=pltpu.VMEM)
        col = pl.BlockSpec((n1, n2 // t), lambda i, j: (0, 0),
                           memory_space=pltpu.VMEM)
        return [base, base, col, col]

    def _tw_args():
        return (jnp.asarray(ebr), jnp.asarray(ebi),
                jnp.asarray(ecr), jnp.asarray(eci))

    def stage1(b, ar, ai):
        grid = (b // bt, n2 // t)
        data = pl.BlockSpec((bt, n1, t), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            s1_kernel, grid=grid,
            in_specs=[data, data] + _tw_specs() + _const_vmem_specs(consts1),
            out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), cdtype)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=16 * b * n1 * n2 * max(1, n1.bit_length() // 5),
                bytes_accessed=(4 * 2 * b * n1 * n2 * 2
                                + 4 * 2 * (n1 * t + n1 * n2 // t)),
                transcendentals=0),
            interpret=interpret, **kw,
        )(ar, ai, *_tw_args(), *[jnp.asarray(c) for c in consts1])

    def stage1_real(b, ar):
        grid = (b // bt, n2 // t)
        data = pl.BlockSpec((bt, n1, t), lambda i, j: (i, 0, j),
                            memory_space=pltpu.VMEM)
        return pl.pallas_call(
            s1r_kernel, grid=grid,
            in_specs=[data] + _tw_specs() + _const_vmem_specs(consts1),
            out_specs=[data, data],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), cdtype)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=12 * b * n1 * n2 * max(1, n1.bit_length() // 5),
                bytes_accessed=(4 * 3 * b * n1 * n2
                                + 4 * 2 * (n1 * t + n1 * n2 // t)),
                transcendentals=0),
            interpret=interpret, **kw,
        )(ar, *_tw_args(), *[jnp.asarray(c) for c in consts1])

    def stage2(b, cr, ci):
        grid = (b // bt, n1 // t)
        data_in = pl.BlockSpec((bt, t, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
        data_out = pl.BlockSpec((bt, n2, t), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            s2_kernel, grid=grid,
            in_specs=[data_in, data_in] + _const_vmem_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((b, n2, n1), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=16 * b * n1 * n2 * max(1, n2.bit_length() // 5),
                bytes_accessed=4 * 2 * b * n1 * n2 * 2,
                transcendentals=0),
            interpret=interpret, **kw,
        )(cr, ci, *[jnp.asarray(c) for c in consts2])

    def stage2_half(b, cr, ci):
        h = n2 // 2
        grid = (b // bt, n1 // t)
        data_in = pl.BlockSpec((bt, t, n2), lambda i, j: (i, j, 0),
                               memory_space=pltpu.VMEM)
        data_out = pl.BlockSpec((bt, h, t), lambda i, j: (i, 0, j),
                                memory_space=pltpu.VMEM)
        return pl.pallas_call(
            s2h_kernel, grid=grid,
            in_specs=[data_in, data_in] + _const_vmem_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=[jax.ShapeDtypeStruct((b, h, n1), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=16 * b * n1 * n2 * max(1, n2.bit_length() // 5),
                bytes_accessed=4 * 2 * b * n1 * n2 + 4 * 2 * b * n1 * h,
                transcendentals=0),
            interpret=interpret, **kw,
        )(cr, ci, *[jnp.asarray(c) for c in consts2])

    return n1, n2, stage1, stage1_real, stage2, stage2_half


# ---------------------------------------------------------------------------
# Phased one-call kernel: both four-step stages in ONE pallas_call, the
# inter-stage C matrix held in persistent VMEM scratch across the
# sequential grid. Each step still traces only a tile-width body (the
# full-width single-call variant compiles for ~350 s — see
# benchmarks/exp_singlepass.py), so compile time matches the two-call
# path while the inter-call C materialization disappears. Measured
# (v5e, 2^20 c32): 136.9 us vs 174 for the two-call path (7.66 Gpts/s,
# -21%); 8x2^20 batched 1.264 ms vs 1.478 (-14.5%). SNR unchanged
# (134.9 dB). benchmarks/exp_phased.py is the measurement record.
# ---------------------------------------------------------------------------

# phased scratch holds both C planes in VMEM: 2*n*4 bytes. Above 2^22
# (32 MB) the margin over the v5e budget thins against blocks + consts;
# larger sizes stay on the two-call kernels. (2^22 A/B: phased 800.2 us
# vs two-call 826.5 — phased still wins at the cap.)
#
# r3 negative result (do not retry): a phase-0 that streams the RANK-1
# flat input into an input scratch inside the kernel (contiguous stripe
# reads + per-chunk lane-slice scatter, replacing the XLA (n,) ->
# (1, n1, n2) input relayout) measured 153.9 us vs 141.1 at 2^20 — the
# in-kernel chunk scatter costs MORE than XLA's native relayout, and
# compile time grows ~2x. Flat mode therefore keeps the XLA input
# relayout and only the OUTPUT side is kernel-emitted.
# Public-path note (r3): rank-1 operands are the fast public form —
# the flat<->tiled relayouts around the kernel cost less for 1-D arrays
# than for (1, n) rank-2 (complex fft_split 142.5 vs 157.5 us at 2^20).
# The raw phased RFFT kernel is 122.0 us vs complex 136.9; with the
# rank-1 flat output phase (phase 3 below) the PUBLIC rank-1 rfft lands
# at 130.1 us < public complex 142.5 — the reference relationship
# (realfft faster than complex, benchmarks/README.md:68-72) now holds
# at the public API. The old reshape+concat epilogue cost ~31 us when
# composed behind the custom-call boundary even though it fuses to ~1 us
# in isolation (benchmarks/exp_rfft_public.py is the decomposition).
_PHASED_MAX_N = 1 << 22
# The 1-pass `default` tier is HBM-bound, so the one-call kernel keeps
# winning one octave further up despite its 64 MB VMEM C-scratch
# (2^23 phased 625 us vs two-call 861, leaf-128); the 6-pass tiers go
# VMEM-pressure-bound there and LOSE to the two-call pair (2097 vs
# 1373) — same per-tier-cap shape as fused_2d_zone. Record:
# benchmarks/exp_p23.out probe + exp_ceiling.py/exp_leaf.py.
# r5: the default cap extends one MORE octave to 2^24 via a bf16
# C-scratch (64 MB where f32 would need an impossible 128) — the tier's
# dots round operands to bf16 anyway, so quantizing C costs ~nothing
# (SNR holds ~43.8 dB); one HBM round trip instead of the two-call
# pair's two. Measured v5e 2^24 default (exp_sdt): 1709.9 us =
# 9.81 Gpts/s at 43.8 dB, vs 2194 for the bf16-C two-call pair and
# 2318 in r4 — and no 2^23 regression (852.8 us, f32 scratch).
_PHASED_MAX_N_DEFAULT = 1 << 24


def _phased_sdt(n: int, mode: str, interpret: bool) -> str:
    """Scratch dtype for the phased kernel: bf16 only where the f32
    scratch cannot fit (the 2^24 octave) on the `default` tier."""
    if mode == "default" and not interpret and n > (1 << 23):
        return "bfloat16"
    return "float32"
# complex flat mode stashes the FULL spectrum in the second scratch
# (2 extra planes: 2n*4 B on top of C's 2n*4 B) — capped one octave
# below the phased ceiling; the real flat variant stashes only the
# one-sided half and runs to the full ceiling (2^22 verified on chip)
_PHASED_FLAT_MAX_N = 1 << 21


@functools.lru_cache(maxsize=None)
def _build_phased(n: int, dtype: str = "float32", interpret: bool = False,
                  mode: str = "highest", real: bool = False,
                  flat: bool = False, io: str = "float32", rows: int = 1,
                  wide: bool = False, sdt: str = "float32"):
    """Phased one-call kernel. Complex: phases (stage 1 | stage 2),
    output the tiled (b, n2, n1) planes (their flat reshape IS the
    natural-order spectrum). Real tiled (``flat=False``): one-sided
    (b, h, n1) rows + the C[k1=0] rows for the XLA Nyquist epilogue.
    Real flat (``flat=True``, single-transform b == 1 only): a third
    phase linearizes stage 2's one-sided rows (second VMEM scratch)
    into the RANK-1 flat (n//2+1,) planes, appending the Nyquist bin
    computed from C's k1=0 row in the tail step. The rank-1 output is
    load-bearing: a (1, m) rank-2 flat output puts each block on one
    sublane of its VMEM vregs (1/8 dense) and the phase measured +55 us;
    the 1-D layout is sublane-dense and the whole assembly costs ~6 us —
    vs ~31 us for the XLA reshape+concat epilogue behind the custom-call
    boundary (isolated it fuses to ~1 us; benchmarks/exp_rfft_public.py).
    Public rfft lands under the public complex FFT, the reference
    relationship (/root/reference/benchmarks/README.md:68-72).

    Complex flat (``flat=True`` with ``real=False``, b == 1 only): the
    same third phase for the full spectrum — stage-2 rows stash in the
    second scratch and phase 3 emits the RANK-1 natural-order (n,)
    planes (no Nyquist tail; n divides the block width), skipping the
    (1, n2, n1) -> (1, n) XLA relayout on the way out.

    ``io='bfloat16'`` emits the OUTPUT HBM planes as bf16 while all
    in-kernel compute stays exactly as the tier specifies — the
    batched-throughput form for the ``default`` tier, where every MXU
    dot rounds its operands to bf16 anyway, so only the final output
    rounding (~48 dB quantization floor) stacks on the tier's ~44 dB.
    The INPUT plane dtype follows the operands independently: bf16
    operands halve the read traffic at zero accuracy cost on this tier
    regardless of ``io`` (asymmetric I/O — f32 public callers cast
    their input in the XLA prologue, where the convert fuses into the
    flat->tiled relayout that materializes anyway, and keep the output
    f32). Measured v5e, 8x2^20 default tier: see
    benchmarks/exp_batch2c.py and benchmarks/exp_io_cast.py.

    ``rows`` folds that many batch rows into each grid step (blocks
    (rows, n1, t), scratch (rows, ph1, n1, t)): halves row transitions
    and doubles DMA block size. Measured v5e 8x2^20 (exp_batch3.py):
    rows=2 is -2.7% at HIGHEST (158.2 -> 153.9 us/row) and -8% at
    default (87.6 -> 80.4); rows=4 WINS ~1 more us at default but
    collapses at HIGHEST (240.7 — scratch eats the pipeline's VMEM), so
    2 is the shipped fold. Mosaic dimension_semantics=(parallel,
    arbitrary) measured a flat zero at both tiers (same experiment) —
    do not retry. Flat mode requires rows == 1.

    ``wide`` (rows > 1 only) fuses the folded rows into ONE wide line
    FFT per phase step — (n1, rows*t) operands instead of a Python
    loop of rows narrow (n1, t) calls — so every MXU leaf dot streams
    rows*t columns, amortizing the per-dot pipeline fill across rows
    (the r5 probe lever for the batched-vs-single per-row gap,
    VERDICT r4 #2; exp_batch4.py is the measurement record)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    n1, n2 = _pow2_split(n)
    t = min(_ML_TILE, n1)
    ph1 = n2 // t                      # stage-1 steps (column tiles)
    ph2 = n1 // t                      # stage-2 steps (line tiles)
    h = n2 // 2 if real else n2        # emitted stage-2 rows
    tk = min(_ML_TILE, h)              # phase-3 spectrum rows per step
    w = tk * n1                        # phase-3 flat block width
    # rank-2 flat form (r5, VERDICT r4 #7): Mosaic's 1-D shape-cast
    # accepts the in-kernel (tk, n1) -> (w,) collapse only for
    # n1 % 1024 == 0; for every other served n1 (smooth odd 768/640,
    # small pow2 128..512) phase 3 emits (w//128, 128) blocks instead —
    # the same sublane-dense layout, it lowers for all n1 % 128 == 0,
    # and the caller-side (rows, 128) <-> (m,) reshape measures ~0.5 us
    # (benchmarks/exp_flatodd.py). This is what extends the
    # no-output-relayout flat path beyond n1 >= 1024 pow2.
    r2flat = flat and (n1 % 1024 != 0)
    wrows = w // 128
    m_flat = n // 2 + 1 if real else n  # flat output length
    # real flat needs a Nyquist tail step; complex flat divides exactly
    ph3 = 0 if not flat else (h // tk) + (1 if real else 0)
    keys1 = _ml_const_keys(n1)
    keys2 = _ml_const_keys(n2)
    consts1 = _ml_const_arrays(keys1, dtype)
    consts2 = _ml_const_arrays(keys2, dtype)
    nc1 = len(consts1)
    ebr, ebi, ecr, eci = _twiddle_factors(n1, n2, t, dtype)
    odt = jnp.dtype(io)

    def _iload(v):
        # input HBM dtype follows the operand (asymmetric I/O): compute
        # is always f32 in-kernel, so non-f32 blocks upcast on load
        return v if v.dtype == jnp.float32 else v.astype(jnp.float32)

    def _ostore(v):
        return v if io == "float32" else v.astype(odt)

    assert rows == 1 or not flat, "flat phased kernels are single-row"
    assert sdt == "float32" or not flat, "flat keeps f32 scratch"
    sdtype = jnp.dtype(sdt)

    def kern(*refs):
        if real:
            (ar,), rest = refs[:1], refs[1:]
            ai = None
        else:
            (ar, ai), rest = refs[:2], refs[2:]
        ebr_r, ebi_r, ecr_r, eci_r = rest[:4]
        crefs = rest[4: 4 + nc1 + len(consts2)]
        outs = rest[4 + nc1 + len(consts2):]
        if flat:
            out_r, out_i, scr_r, scr_i, sc2_r, sc2_i = outs
        elif real:
            out_r, out_i, nyq_r, nyq_i, scr_r, scr_i = outs
        else:
            out_r, out_i, scr_r, scr_i = outs
        cd1 = _unpack_consts(keys1, crefs[:nc1])
        cd2 = _unpack_consts(keys2, crefs[nc1:])
        i = pl.program_id(1)

        @pl.when(i < ph1)
        def _stage1():
            # column tile i: FFT each length-n1 column, twiddle, stash.
            # Twiddle block synthesized from the factored tables via a
            # one-hot lane select (Mosaic lowers neither 1-wide lane
            # blocks nor dynamic width-1 lane slices); hoisted out of
            # the rows loop (identical for every batch row).
            tbl_r = ecr_r[...]
            tbl_i = eci_r[...]
            lane = jax.lax.broadcasted_iota(jnp.int32, tbl_r.shape, 1)
            sel = (lane == i).astype(tbl_r.dtype)
            c_r = jnp.sum(tbl_r * sel, axis=1, keepdims=True)
            c_i = jnp.sum(tbl_i * sel, axis=1, keepdims=True)
            w_r = c_r * ebr_r[...] - c_i * ebi_r[...]
            w_i = c_r * ebi_r[...] + c_i * ebr_r[...]
            if wide and rows > 1:
                # one wide line FFT over all folded rows: every leaf dot
                # streams rows*t columns (per-dot fill amortized)
                xr_all = jnp.concatenate(
                    [_iload(ar[r]) for r in range(rows)], axis=-1)
                xi_all = None if real else jnp.concatenate(
                    [_iload(ai[r]) for r in range(rows)], axis=-1)
                yr, yi = _fft_axis0_traced(xr_all, xi_all, n1, cd1, mode)
                for r in range(rows):
                    ys_r = yr[:, r * t:(r + 1) * t]
                    ys_i = yi[:, r * t:(r + 1) * t]
                    cr = ys_r * w_r - ys_i * w_i
                    ci = ys_r * w_i + ys_i * w_r
                    scr_r[r, i] = cr.astype(sdtype)
                    scr_i[r, i] = ci.astype(sdtype)
                    if real and not flat:
                        nyq_r[r] = _ostore(cr[0:1, :])
                        nyq_i[r] = _ostore(ci[0:1, :])
                return
            for r in range(rows):
                yr, yi = _fft_axis0_traced(
                    _iload(ar[r]), None if real else _iload(ai[r]),
                    n1, cd1, mode)
                cr = yr * w_r - yi * w_i
                ci = yr * w_i + yi * w_r
                scr_r[r, i] = cr.astype(sdtype)
                scr_i[r, i] = ci.astype(sdtype)
                if real and not flat:
                    # the Nyquist epilogue needs C[k1=0, :]: emit it as
                    # a small second output, one (rows, 1, t) tile per
                    # column step
                    nyq_r[r] = _ostore(cr[0:1, :])
                    nyq_i[r] = _ostore(ci[0:1, :])

        @pl.when(jnp.logical_and(i >= ph1, i < ph1 + ph2))
        def _stage2():
            j = i - ph1
            if wide and rows > 1:
                # one wide line FFT over all folded rows (see _stage1)
                cols = []
                for r in range(rows):
                    br = jnp.concatenate(
                        [scr_r[r, c, pl.ds(j * t, t), :]
                         for c in range(ph1)], axis=1)
                    bi = jnp.concatenate(
                        [scr_i[r, c, pl.ds(j * t, t), :]
                         for c in range(ph1)], axis=1)
                    cols.append((br.T, bi.T))            # (n2, t)
                ball_r = jnp.concatenate(
                    [c[0] for c in cols], axis=-1).astype(jnp.float32)
                ball_i = jnp.concatenate(
                    [c[1] for c in cols], axis=-1).astype(jnp.float32)
                zr, zi = _fft_axis0_traced(ball_r, ball_i, n2, cd2, mode)
                for r in range(rows):
                    zs_r = zr[:, r * t:(r + 1) * t]
                    zs_i = zi[:, r * t:(r + 1) * t]
                    if real:
                        out_r[r] = _ostore(zs_r[:h])
                        out_i[r] = _ostore(zs_i[:h])
                    else:
                        out_r[r] = _ostore(zs_r)
                        out_i[r] = _ostore(zs_i)
                return
            for r in range(rows):
                # line block (t, n2): rows [j*t, j*t+t) of the (n1, n2)
                # C view = that row range of every scratch chunk
                br = jnp.concatenate(
                    [scr_r[r, c, pl.ds(j * t, t), :] for c in range(ph1)],
                    axis=1).astype(jnp.float32)
                bi = jnp.concatenate(
                    [scr_i[r, c, pl.ds(j * t, t), :] for c in range(ph1)],
                    axis=1).astype(jnp.float32)
                zr, zi = _fft_axis0_traced(br.T, bi.T, n2, cd2, mode)
                if flat:
                    sc2_r[j] = zr[:h]      # all rows (complex) / k2 < n2/2
                    sc2_i[j] = zi[:h]
                elif real:
                    out_r[r] = _ostore(zr[:h])  # one-sided: k2 < n2/2
                    out_i[r] = _ostore(zi[:h])
                else:
                    out_r[r] = _ostore(zr)      # (n2, t)
                    out_i[r] = _ostore(zi)

        if flat:
            @pl.when(i >= ph1 + ph2)
            def _stage3():
                p = i - ph1 - ph2
                # complex flat has no tail step (n divides the blocks)
                is_tail = (p == ph3 - 1) if real else (p < 0)

                @pl.when(jnp.logical_not(is_tail))
                def _rows():
                    # spectrum rows [p*tk, (p+1)*tk) across all k1: the
                    # (tk, t) row-slices of every stage-2 chunk, joined
                    # and linearized to the flat k = k2*n1 + k1 order
                    rs = jnp.concatenate(
                        [sc2_r[c, pl.ds(p * tk, tk), :]
                         for c in range(ph2)], axis=1)      # (tk, n1)
                    im = jnp.concatenate(
                        [sc2_i[c, pl.ds(p * tk, tk), :]
                         for c in range(ph2)], axis=1)
                    if r2flat:
                        out_r[...] = _ostore(rs.reshape(wrows, 128))
                        out_i[...] = _ostore(im.reshape(wrows, 128))
                    else:
                        out_r[...] = _ostore(rs.reshape(w))
                        out_i[...] = _ostore(im.reshape(w))

                @pl.when(is_tail)
                def _nyquist():
                    # X[n/2] = sum_j2 (-1)^j2 C[k1=0, j2]; j2 = c*t + u
                    # and t is even, so the sign depends on u alone
                    sgn = 1.0 - 2.0 * (jax.lax.broadcasted_iota(
                        jnp.int32, (1, t), 1) % 2).astype(jnp.float32)
                    acc_r = jnp.float32(0.0)
                    acc_i = jnp.float32(0.0)
                    for c in range(ph1):
                        acc_r += jnp.sum(scr_r[0, c, 0:1, :] * sgn)
                        acc_i += jnp.sum(scr_i[0, c, 0:1, :] * sgn)
                    if r2flat:
                        ri2 = jax.lax.broadcasted_iota(
                            jnp.int32, (wrows, 128), 0)
                        ci2 = jax.lax.broadcasted_iota(
                            jnp.int32, (wrows, 128), 1)
                        m0 = jnp.logical_and(ri2 == 0, ci2 == 0)
                        out_r[...] = _ostore(jnp.where(m0, acc_r, 0.0))
                        out_i[...] = _ostore(jnp.where(m0, acc_i, 0.0))
                    else:
                        lane = jax.lax.iota(jnp.int32, w)
                        out_r[...] = _ostore(
                            jnp.where(lane == 0, acc_r, 0.0))
                        out_i[...] = _ostore(
                            jnp.where(lane == 0, acc_i, 0.0))

    data_in = pl.BlockSpec((rows, n1, t),
                           lambda b_, i: (b_, 0, jnp.minimum(i, ph1 - 1)),
                           memory_space=pltpu.VMEM)
    if flat:
        # RANK-1 flat output (sublane-dense; see docstring):
        # phase-3 step p of batch row b_ writes block b_*ph3 + p; earlier
        # steps revisit the row's first block unwritten (kept in VMEM,
        # flushed once written — the same revisited-block pattern as
        # data_out below). Batched complex flat (r4): the output stays a
        # single rank-1 (b*n,) plane so every block keeps the
        # sublane-dense 1-D layout — the row index folds into the block
        # index instead of adding a rank (a (b, w) rank-2 block would put
        # each block on one sublane, the +55 us layout this mode exists
        # to avoid); the caller reshapes (b*n,) -> (b, n) for free
        # (row-major contiguous). MEASURED NEGATIVE for routing at
        # 8x2^20 (exp_batch_flat.py): 429 us/row HIGHEST / 358 default
        # vs the tiled grid's 165.7/83.6 — the revisited-block pattern
        # that costs nothing at b=1 re-DMAs across the batch grid axis.
        # Capability + parity test kept; not routed.
        if r2flat:
            # rank-2 flat blocks (see r2flat note above): same
            # block-index walk, one extra trailing lane dim
            data_out = pl.BlockSpec(
                (wrows, 128),
                lambda b_, i: (b_ * ph3 + jnp.maximum(i - ph1 - ph2, 0),
                               0),
                memory_space=pltpu.VMEM)
        else:
            data_out = pl.BlockSpec(
                (w,),
                lambda b_, i: (b_ * ph3 + jnp.maximum(i - ph1 - ph2, 0),),
                memory_space=pltpu.VMEM)
    elif real:
        data_out = pl.BlockSpec(
            (rows, h, t),
            lambda b_, i: (b_, 0, jnp.maximum(i - ph1, 0)),
            memory_space=pltpu.VMEM)
    else:
        data_out = pl.BlockSpec(
            (rows, n2, t),
            lambda b_, i: (b_, 0, jnp.maximum(i - ph1, 0)),
            memory_space=pltpu.VMEM)
    # the nyq output advances with the phase-1 column step; every
    # phase-2 step pins to the LAST column tile (min(i, ph1-1)) without
    # writing, so only that already-written tile is revisited and its
    # content is flushed back unchanged — earlier tiles are never
    # touched again
    nyq_out = pl.BlockSpec((rows, 1, t),
                           lambda b_, i: (b_, 0, jnp.minimum(i, ph1 - 1)),
                           memory_space=pltpu.VMEM)
    base = pl.BlockSpec((n1, t), lambda b_, i: (0, 0),
                        memory_space=pltpu.VMEM)
    col = pl.BlockSpec((n1, n2 // t), lambda b_, i: (0, 0),
                       memory_space=pltpu.VMEM)

    nin = 1 if real else 2
    out_specs = [data_out, data_out]
    if real and not flat:
        out_specs += [nyq_out, nyq_out]
    # ``sdt='bfloat16'`` halves the C scratch (the binding VMEM cost):
    # on the 1-pass `default` tier every dot rounds its operands to
    # bf16 anyway, so quantizing C costs ~nothing — and it is what lets
    # the ONE-call kernel serve 2^24 (f32 scratch would need 128 MB)
    scratch = [pltpu.VMEM((rows, ph1, n1, t), sdtype)] * 2
    if flat:
        scratch += [pltpu.VMEM((ph2, h, t), jnp.float32)] * 2

    def run(b, ar, ai=None):
        args = (ar,) if real else (ar, ai)
        if flat:
            # real flat has a partial tail block (m_flat = n//2 + 1 does
            # not tile to ph3*w), so its padding only lines up at b == 1;
            # complex flat tiles exactly and batches (r4)
            assert b == 1 or not real, "flat rfft kernels are single-row"
            if r2flat:
                # exact block tiling (no partial tail): ph3*wrows rows;
                # the real form's flat size is n//2 + w >= m_flat and
                # the caller slices after its ~free rank-1 reshape
                shapes = [jax.ShapeDtypeStruct(
                    (b * ph3 * wrows, 128), odt)] * 2
            else:
                shapes = [jax.ShapeDtypeStruct(
                    (m_flat if b == 1 else b * n,), odt)] * 2
        elif real:
            shapes = [jax.ShapeDtypeStruct((b, h, n1), odt)] * 2
            shapes += [jax.ShapeDtypeStruct((b, 1, n2), odt)] * 2
        else:
            shapes = [jax.ShapeDtypeStruct((b, n2, n1), odt)] * 2
        assert b % rows == 0, (b, rows)
        return pl.pallas_call(
            kern, grid=(b // rows, ph1 + ph2 + ph3),
            in_specs=[data_in] * nin + [base, base, col, col]
            + _const_vmem_specs(consts1) + _const_vmem_specs(consts2),
            out_specs=out_specs,
            out_shape=shapes,
            scratch_shapes=scratch,
            cost_estimate=pl.CostEstimate(
                flops=32 * b * n * max(1, n.bit_length() // 5),
                bytes_accessed=4 * 2 * b * n * 2,
                transcendentals=0),
            # interpret mode (CPU tests) never passes TPU compiler
            # params — same policy as _ml_compiler_kwargs
            **({} if interpret else {"compiler_params":
                pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)}),
            interpret=interpret,
        )(*args, jnp.asarray(ebr), jnp.asarray(ebi), jnp.asarray(ecr),
          jnp.asarray(eci), *[jnp.asarray(c) for c in consts1],
          *[jnp.asarray(c) for c in consts2])

    return run


def _use_phased(n: int, bt: int) -> bool:
    """The phased one-call kernel serves bt == 1 shapes up to the VMEM
    scratch ceiling — PER TIER: 2^22 on the 6-pass tiers, 2^23 on the
    HBM-bound 1-pass `default` tier (see _PHASED_MAX_N_DEFAULT). Batch-
    folded small shapes and sizes above the cap stay on the two-call
    kernels. Tier changes retrace safely: every jitted entry keys on
    ``config.trace_key()``, which carries the precision."""
    cap = (_PHASED_MAX_N_DEFAULT if _kernel_precision() == "default"
           else _PHASED_MAX_N)
    return bt == 1 and n <= cap


def _phased_rows(n: int, b: int) -> int:
    """Batch rows folded per phased grid step. rows=2 measured -2.7%
    at HIGHEST and -8% at default (8x2^20, exp_batch3.py); rows=4
    collapses at HIGHEST (scratch squeezes the pipeline's VMEM), so 2
    is the fold, gated to n <= 2^21 (scratch is rows * 2n * 4 B)."""
    if b > 1 and b % 2 == 0 and n <= (1 << 21):
        return 2
    return 1


def fused_multilevel_fft(xr, xi, n: int, interpret: bool = False):
    """Forward unnormalized DFT via the multi-level fused kernels.
    Output ordering matches ``fused_four_step_fft`` / ``_apply_tree``
    *only if* each stage's in-VMEM line FFT produces natural order — it
    does: the recursion emits k = ka + a*kb along the line axis.

    bfloat16 planes select the half-HBM-traffic I/O form of the phased
    kernel (in-kernel compute unchanged; see ``_build_phased`` io=);
    shapes the phased grid does not serve upcast to the f32 kernels and
    round the result back — correctness first, the speed path is the
    served zone."""
    io = "bfloat16" if str(xr.dtype) == "bfloat16" else "float32"
    batch = xr.shape[:-1]
    b = 1
    for s in batch:
        b *= s
    n1, n2 = _pow2_split(n)
    bt = _ml_batch_tile(b, n1, n2)
    ar = xr.reshape(b, n1, n2)
    ai = xi.reshape(b, n1, n2)
    if io != "float32":
        if _use_phased(n, bt):
            mode = _kernel_precision()
            run = _build_phased(n, "float32", interpret, mode, io=io,
                                rows=_phased_rows(n, b),
                                sdt=_phased_sdt(n, mode, interpret))
            yr, yi = run(b, ar, ai)
            return yr.reshape(*batch, n), yi.reshape(*batch, n)
        yr, yi = fused_multilevel_fft(xr.astype(jnp.float32),
                                      xi.astype(jnp.float32), n, interpret)
        return yr.astype(xr.dtype), yi.astype(xr.dtype)
    if _use_phased(n, bt) and batch == () and n <= _PHASED_FLAT_MAX_N:
        # rank-1 single transform: phase 3 emits the natural-order flat
        # (n,) planes straight from the second VMEM scratch — no
        # (1, n2, n1) -> (n,) XLA relayout on the way out. n1 with
        # n1 % 1024 != 0 (smooth odd, small pow2) emits rank-2
        # (w//128, 128) blocks instead (Mosaic rejects their 1-D
        # shape-cast) and the caller's reshape costs ~0.5 us
        # (exp_flatodd.py) — since r5 the flat path serves EVERY
        # phased-served smooth size, not just pow2 with n1 >= 1024
        run = _build_phased(n, str(xr.dtype), interpret,
                            _kernel_precision(), flat=True)
        yr, yi = run(1, ar, ai)
        return yr.reshape(n), yi.reshape(n)
    if _use_phased(n, bt):
        # batched rows keep the (b, phases) grid. A lax.scan of the b=1
        # launch is 17-24% faster on PRE-TILED (b, n1, n2) operands
        # (131.1 vs 157.9 us/row at 8x2^20 HIGHEST) but LOSES behind the
        # public flat (b, n) boundary: the flat->tiled relayout that XLA
        # elides into the single batched custom-call must fully
        # materialize when a scan dynamic-slices it (public 1.443 ms vs
        # 1.343 grid). benchmarks/exp_batch_scan.py is the measurement
        # record — negative result for the public path, do not retry
        # without a tiled-layout public escape hatch.
        mode = _kernel_precision()
        if mode == "default" and not interpret:
            # asymmetric I/O (exp_io_cast.py): the default tier's dots
            # round operands to bf16 anyway, so bf16 INPUT planes cost
            # no accuracy; the cast partially fuses into the
            # flat->tiled input relayout (8x2^20: 95.4 -> 89.6 us/row
            # public; 2^22 single: 410.7 -> 396.6 us). Output stays f32
            # (bf16-out + upcast measured SLOWER, 100.8 us/row — the
            # upcast does not fuse into the output relayout). Interpret
            # mode (CPU tests) keeps f32 I/O so off-chip parity bounds
            # are tier-only.
            ar = ar.astype(jnp.bfloat16)
            ai = ai.astype(jnp.bfloat16)
        run = _build_phased(n, str(xr.dtype), interpret, mode,
                            rows=_phased_rows(n, b),
                            sdt=_phased_sdt(n, mode, interpret))
        yr, yi = run(b, ar, ai)
        return yr.reshape(*batch, n), yi.reshape(*batch, n)
    mode = _kernel_precision()
    cdt = "float32"
    if mode == "default" and not interpret:
        # the two-call pair's dominant cost is its TWO HBM round trips;
        # on the 1-pass tier the dots round operands to bf16 anyway, so
        # a bf16 inter-stage C (write + read = the middle half of the
        # traffic) and bf16 input planes (asymmetric I/O, the cast fuses
        # into the flat->tiled relayout) are near-free accuracy-wise.
        # Outputs stay f32 (bf16-out upcast does not fuse — same
        # negative as the phased path's io= note). Measured v5e 2^24
        # default (exp_p56, before the phased bf16-scratch took that
        # size): 2318 -> 2194 us at 43.9 dB — only ~5%, so the pair is
        # DMA-granularity-bound, not HBM-bound; kept because it is pure
        # profit for the sizes still routed here (2^25/2^26, bt>1
        # folds).
        cdt = "bfloat16"
        ar = ar.astype(jnp.bfloat16)
        ai = ai.astype(jnp.bfloat16)
    n1, n2, stage1, _, stage2, _ = _build_ml(n, str(xr.dtype), interpret,
                                             mode, bt, cdt=cdt)
    cr, ci = stage1(b, ar, ai)
    yr, yi = stage2(b, cr, ci)
    return yr.reshape(*batch, n), yi.reshape(*batch, n)


def fused_multilevel_rfft(x, n: int, interpret: bool = False):
    """ONE-SIDED unnormalized DFT of a REAL signal via the multi-level
    kernels: stage 1 reads a single plane (no zero-imag HBM traffic, 2
    leaf dots instead of 3 at the first level; measured 64.8 vs 80.3 us
    at 2^20); stage 2 writes only the first ``n/2`` spectrum rows
    (k2 < n2/2 <=> flat k < n/2) straight from VMEM — no full-spectrum
    materialization + XLA slice pass. The Nyquist bin (k2 = n2/2,
    k1 = 0) is an alternating sum over C's k1 = 0 row; the whole
    one-sided assembly epilogue measures 8.6 us (r1's "rfft slower than
    the complex FFT" was mostly a harness-structure artifact — see
    benchmarks/exp_harness_bias.py — plus the halved write traffic
    here). Returns planes of shape (..., n//2 + 1). bfloat16 input
    rides the bf16-I/O form of the phased grid (see
    ``fused_multilevel_fft``); unserved shapes upcast."""
    io = "bfloat16" if str(x.dtype) == "bfloat16" else "float32"
    batch = x.shape[:-1]
    b = 1
    for s in batch:
        b *= s
    n1, n2 = _pow2_split(n)
    bt = _ml_batch_tile(b, n1, n2)
    if io != "float32":
        if not _use_phased(n, bt):
            yr, yi = fused_multilevel_rfft(x.astype(jnp.float32), n,
                                           interpret)
            return yr.astype(x.dtype), yi.astype(x.dtype)
        mode = _kernel_precision()
        run = _build_phased(n, "float32", interpret, mode,
                            real=True, io=io, rows=_phased_rows(n, b),
                            sdt=_phased_sdt(n, mode, interpret))
        hr, hi, c0r, c0i = run(b, x.reshape(b, n1, n2))
        # Nyquist epilogue in f32 (bf16 accumulation would round the
        # alternating sum), result rounded back to the io dtype
        signs = jnp.asarray(
            tables.custom(("altsign", n2, "float32"),
                          lambda: (np.where(np.arange(n2) % 2 == 0,
                                            1.0, -1.0)
                                   .astype("float32"),))[0])
        nr = jnp.sum(c0r[:, 0, :].astype(jnp.float32) * signs,
                     axis=-1)[:, None].astype(x.dtype)
        ni = jnp.sum(c0i[:, 0, :].astype(jnp.float32) * signs,
                     axis=-1)[:, None].astype(x.dtype)
        yr = jnp.concatenate([hr.reshape(b, n // 2), nr], axis=-1)
        yi = jnp.concatenate([hi.reshape(b, n // 2), ni], axis=-1)
        return (yr.reshape(*batch, n // 2 + 1),
                yi.reshape(*batch, n // 2 + 1))
    if _use_phased(n, bt) and batch == () and n <= (1 << 23):
        # n cap: flat keeps an f32 C scratch (assert in _build_phased),
        # whose ceiling is 64 MB = 2^23; the 2^24 default octave rides
        # the tiled real path below with the bf16 scratch instead.
        # 1-D single transform: the phased real kernel emits the RANK-1
        # FLAT one-sided planes itself (phase-3 assembly in VMEM
        # scratch) — no reshape/concat epilogue, which cost ~31 us at
        # 2^20 behind the custom-call boundary. n1 % 1024 != 0 sizes
        # emit rank-2 (w//128, 128) blocks (see the complex flat note);
        # the caller's reshape + one-sided slice is ~free. Restricted
        # to rank-1 inputs: reshaping the (m,) result to (1, m)
        # materializes the sublane-sparse rank-2 layout and costs MORE
        # than the epilogue it saves (measured 195 vs 164 us at 2^20) —
        # batched and (1, n)-shaped callers ride the tiled path below.
        # Public rank-1 rfft at 2^20: 130 us vs 157 for the public
        # complex FFT (the reference relationship,
        # benchmarks/README.md:68-72).
        run = _build_phased(n, str(x.dtype), interpret,
                            _kernel_precision(), real=True, flat=True)
        yr, yi = run(1, x.reshape(1, n1, n2))
        m_flat = n // 2 + 1
        return yr.reshape(-1)[:m_flat], yi.reshape(-1)[:m_flat]
    if _use_phased(n, bt):
        # batched REAL rows keep the (b, phases) grid: the lax.scan-of-
        # b=1 restructure that wins for complex (exp_batch_scan.py)
        # measured 145.1 vs 138.6 us/row here — stage 1 reads one plane
        # (half the input DMA) and the 4 outputs drain smaller blocks,
        # so the grid already overlaps; negative result, do not retry
        mode = _kernel_precision()
        xin = x.reshape(b, n1, n2)
        if mode == "default" and not interpret:
            # asymmetric I/O: bf16 input plane at zero tier accuracy
            # cost, outputs stay f32 (see fused_multilevel_fft)
            xin = xin.astype(jnp.bfloat16)
        run = _build_phased(n, str(x.dtype), interpret, mode,
                            real=True, rows=_phased_rows(n, b),
                            sdt=_phased_sdt(n, mode, interpret))
        hr, hi, c0r, c0i = run(b, xin)
        c0r = c0r[:, 0, :]                       # (b, n2): C[k1=0, :]
        c0i = c0i[:, 0, :]
    else:
        mode = _kernel_precision()
        cdt = "float32"
        xin = x.reshape(b, n1, n2)
        if mode == "default" and not interpret:
            # same default-tier traffic cuts as the complex two-call
            # branch: bf16 inter-stage C + bf16 input plane
            cdt = "bfloat16"
            xin = xin.astype(jnp.bfloat16)
        n1, n2, _, stage1_real, _, stage2_half = _build_ml(
            n, str(x.dtype), interpret, mode, bt, cdt=cdt)
        cr, ci = stage1_real(b, xin)
        hr, hi = stage2_half(b, cr, ci)          # (b, n2//2, n1)
        c0r = cr[:, 0, :]
        c0i = ci[:, 0, :]
    # Nyquist: X[n/2] = sum_j2 (-1)^j2 * C[k1=0, j2]
    signs = jnp.asarray(
        tables.custom(("altsign", n2, str(x.dtype)),
                      lambda: (np.where(np.arange(n2) % 2 == 0, 1.0, -1.0)
                               .astype(str(x.dtype)),))[0])
    nr = jnp.sum(c0r * signs, axis=-1)[:, None]
    ni = jnp.sum(c0i * signs, axis=-1)[:, None]
    yr = jnp.concatenate([hr.reshape(b, n // 2), nr], axis=-1)
    yi = jnp.concatenate([hi.reshape(b, n // 2), ni], axis=-1)
    return yr.reshape(*batch, n // 2 + 1), yi.reshape(*batch, n // 2 + 1)


# ---------------------------------------------------------------------------
# Fused N-D kernel: ALL axis passes of a VMEM-sized grid in ONE
# pallas_call — one HBM round-trip instead of one per axis. Each pass
# contracts the current last axis with that axis's dense DFT matrix as
# the dot_general LHS, whose (lhs-free, rhs-free) output order IS the
# cyclic axis rotation: (a, b, c) -contract c-> (k_c, a, b); after d
# passes the tensor sits in natural (k_0 .. k_{d-1}) order with no
# explicit transpose, only row-major 2-D reshapes between passes.
# Measured (v5e, HIGHEST, chained): 128^3 c32 175.4 us vs 211.9 for the
# per-axis einsum path (-17%, SNR 135.3 dB), 512^2 50.8 vs 55.8.
# 1024-point axes LOSE (dense O(n^2) per axis: 404 us at 1024^2 vs 147
# for XLA's fftn) and 64-point axes crash the Mosaic remote compiler —
# hence the [128, 512] pow2 axis gate below. Shapes past the VMEM
# budget (256^3, 256x256x128...) are transpose/HBM-bound identically on
# every engine (ours == jnp.fft.fftn within 2%); they keep the existing
# paths. benchmarks/exp_nd_fused records the probes.
# ---------------------------------------------------------------------------

_FUSED_ND_MIN_POINTS = 1 << 17     # below: launch-bound, einsum path fine
_FUSED_ND_MAX_POINTS = 1 << 21     # 2 planes x 8 MB in + out + temps <=
                                   # ~64 MB VMEM at 128^3


def fused_nd_zone(shape: tuple, axes: tuple) -> bool:
    """True when the fused all-axes kernel serves this transform: every
    dim transformed, each a power of two in [128, 512], and the whole
    tensor VMEM-resident."""
    nd = len(shape)
    if len(axes) < 2 or sorted(a % nd for a in axes) != list(range(nd)):
        return False
    total = 1
    for s in shape:
        if s & (s - 1) or not (128 <= s <= 512):
            return False
        total *= s
    return _FUSED_ND_MIN_POINTS <= total <= _FUSED_ND_MAX_POINTS


@functools.lru_cache(maxsize=None)
def _build_fused_nd(shape: tuple, dtype: str = "float32",
                    interpret: bool = False, mode: str = "highest"):
    """One-call all-axes DFT over a VMEM-resident tensor (see block
    comment above). Returns run(ar, ai) -> (yr, yi), natural order."""
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    d = len(shape)
    total = 1
    for s in shape:
        total *= s
    sizes = list(shape[::-1])          # contraction order: last axis first
    consts = []                        # host numpy: converted at CALL time
    for m in sizes:                    # (a build during tracing must not
        fr, fi = tables.dft_matrix(m, dtype)   # cache tracer constants)
        consts += [fr, fi]

    def kern(ar_ref, ai_ref, *rest):
        frefs = rest[:2 * d]
        yr_ref, yi_ref = rest[2 * d:]
        xr = ar_ref[...]
        xi = ai_ref[...]
        for pi, m in enumerate(sizes):
            fr = frefs[2 * pi][...]
            fi = frefs[2 * pi + 1][...]
            x2r = xr.reshape(total // m, m)
            x2i = xi.reshape(total // m, m)
            # F[j,k] on the left, contract its j with the tensor's last
            # axis: output (k, rest) = the cyclic rotation for free
            xr, xi = _cdot(fr, fi, x2r, x2i, ((0,), (1,)), mode)
        yr_ref[...] = xr.reshape(shape)
        yi_ref[...] = xi.reshape(shape)

    full = pl.BlockSpec(shape, lambda: (0,) * d, memory_space=pltpu.VMEM)
    cspecs = [pl.BlockSpec(c.shape,
                           (lambda nd_: lambda: (0,) * nd_)(c.ndim),
                           memory_space=pltpu.VMEM) for c in consts]
    f = pl.pallas_call(
        kern, grid=(),
        in_specs=[full, full] + cspecs,
        out_specs=[full, full],
        out_shape=[jax.ShapeDtypeStruct(shape, jnp.float32)] * 2,
        cost_estimate=pl.CostEstimate(
            flops=8 * total * sum(shape),
            bytes_accessed=4 * 2 * total * 2, transcendentals=0),
        interpret=interpret,
        **({} if interpret else {"compiler_params": pltpu.CompilerParams(
            vmem_limit_bytes=100 * 1024 * 1024)}),
    )
    return lambda ar, ai: f(ar, ai, *[jnp.asarray(c) for c in consts])


def phased_tiled_fft(ar, ai, interpret: bool = False):
    """Forward unnormalized DFT on TILED (b, m, m) planes, n = m*m:
    flat row-major input is the signal, flat row-major output is the
    natural-order spectrum (the phased kernel's native I/O). This is
    the no-relayout pipeline entry (``ops.fft.fft_split_tiled``):
    callers that keep planes tiled skip the flat<->tiled XLA copies on
    both ends of every transform in a chained pipeline.

    Batched rows use the (b, phases) grid. A lax.scan of the b=1 launch
    measured 131.1 vs 157.9 us/row at 8x2^20 HIGHEST on pre-tiled
    operands (r3), but the win is COMPILER-DEPENDENT: the same scan
    program later failed to compile on this session's restarted axon
    compile helper — XLA pins the scan-sliced pallas result into VMEM
    (S(1)) and overflows the 16 MB scoped-vmem stack (``Scoped
    allocation with size 16.89M and limit 16.00M``), a backend knob
    (xla_tpu_scoped_vmem_limit_kib) that is not client-settable, and an
    optimization_barrier workaround compiles but measures 158.9 (the
    grid's time, win gone). Do not re-ship the scan without compiling
    it first on the current toolchain. benchmarks/exp_batch_scan.py
    holds the full record.

    Batched SMALL tiled shapes fold batch rows exactly like the flat
    path (``_ml_batch_tile``; (1, n1, t) blocks are launch-bound at
    2^14) and ride the two-call kernels — same (b, n2, n1) output
    contract as the phased grid."""
    b = ar.shape[0]
    m = ar.shape[-1]
    n = m * m
    bt = _ml_batch_tile(b, m, m)
    io = "bfloat16" if str(ar.dtype) == "bfloat16" else "float32"
    if _use_phased(n, bt):
        # constants/tables stay f32; io only switches the HBM plane
        # dtype (half traffic for bf16 pipelines — see _build_phased).
        # No asymmetric-I/O cast here: pre-tiled operands have no
        # relayout for the convert to fuse into, so a cast would add a
        # full pass for the half it saves (net zero).
        mode = _kernel_precision()
        run = _build_phased(n, "float32", interpret, mode, io=io,
                            rows=_phased_rows(n, b),
                            sdt=_phased_sdt(n, mode, interpret))
        return run(b, ar, ai)
    if io != "float32":
        yr, yi = phased_tiled_fft(ar.astype(jnp.float32),
                                  ai.astype(jnp.float32), interpret)
        return yr.astype(ar.dtype), yi.astype(ar.dtype)
    mode = _kernel_precision()
    # bf16 inter-stage C on the 1-pass tier (no input cast here: pre-
    # tiled operands have no relayout for the convert to fuse into)
    cdt = "bfloat16" if mode == "default" and not interpret else "float32"
    _, _, stage1, _, stage2, _ = _build_ml(n, str(ar.dtype), interpret,
                                           mode, bt, cdt=cdt)
    cr, ci = stage1(b, ar, ai)
    return stage2(b, cr, ci)


def fused_ndfft_planes(xr, xi, inverse: bool = False,
                       interpret: bool = False):
    """All-axes N-D DFT via the fused one-call kernel (zone-gated by
    ``fused_nd_zone``). Inverse is UNNORMALIZED (caller scales), via the
    conjugation identity."""
    run = _build_fused_nd(tuple(xr.shape), str(xr.dtype), interpret,
                          _kernel_precision())
    if inverse:
        yr, yi = run(xr, -xi)
        return yr, -yi
    return run(xr, xi)


_FUSED_2D_MIN_POINTS = 1 << 18     # below: einsum/per-axis launch-bound
_FUSED_2D_MAX_POINTS = 1 << 22     # scratch = 2 planes x total x 4 B


def fused_2d_zone(shape: tuple, axes: tuple) -> bool:
    """True when the phased 2-D kernel serves this transform: the LAST
    TWO dims transformed (leading dims fold into the kernel's batch
    grid), both pow2 in [128, 2048], total per image in 2^18 up to the
    PER-TIER cap below. It owns the whole 2-D range — the leaf-32 recursion
    beats the dense-DFT fused-nd kernel even where both serve (512^2:
    33.8 vs 51.0 us; 256x1024: 34.2 vs 76.4; dense stays the 3-D
    engine). The upper cap is PER-TIER (measured v5e): the 6-pass
    ``highest`` kernel loses to XLA's fftn at 2^21/image (1024x2048:
    332 vs 320 us) so it caps at 2^20 — and ``high`` costs the same 6
    passes (r2 isolation: bf16x3 gains nothing), so it caps with it.
    The 1-pass ``default`` tier is HBM-bound and keeps winning through
    2^22 (1024x2048: 152 vs 320, 2.1x; 2048^2: 396.6 vs 651.7, 1.64x).
    Above each tier's cap the TWO-call pair takes over
    (``fused_2d_big_zone``) — since the r4 leaf-128 change it beats
    both this kernel and XLA fftn at 2^21-2^22/image on the 6-pass
    tiers (1024x2048: 271.1 vs 282.8 vs 319.4; 2048^2: 547.1 vs 618.4
    vs 653.6 — benchmarks/exp_2dcap.out). Tier changes retrace safely —
    every jitted entry keys on ``config.trace_key()``, which carries
    the precision."""
    nd = len(shape)
    if nd < 2 or len(axes) != 2:
        return False
    if sorted(a % nd for a in axes) != [nd - 2, nd - 1]:
        return False
    n1, n2 = shape[-2], shape[-1]
    for s in (n1, n2):
        if s & (s - 1) or not (128 <= s <= 2048):
            return False
    cap = _FUSED_2D_MAX_POINTS if _kernel_precision() == "default" \
        else (1 << 20)
    return _FUSED_2D_MIN_POINTS <= n1 * n2 <= cap


@functools.lru_cache(maxsize=None)
def _build_fft2(n1: int, n2: int, dtype: str = "float32",
                interpret: bool = False, mode: str = "highest",
                bt: int = 1):
    """One-call 2-D FFT kernel: the phased four-step WITHOUT the
    inter-stage twiddle. A 2-D transform of an (n1, n2) image is
    exactly the two stages of the Bailey 1-D decomposition of
    n = n1*n2 minus the twiddle between them, so the grid, scratch
    choreography and per-line recursion are those of ``_build_phased``;
    what changes is (a) no twiddle tables enter the kernel and (b)
    stage 2 emits its line blocks UNtransposed — the (b, n1, n2) output
    is the natural image layout, not the 1-D spectrum's (b, n2, n1).
    There is no flat<->tiled relayout on either side: the image IS the
    kernel's native layout (the reference reaches 2-D by strided 1-D
    line loops, /root/reference/src/ndfft.rs:74-100; one HBM round-trip
    replaces its per-axis passes). Returns run(b, ar, ai) -> (yr, yi)
    on (b, n1, n2) planes, forward unnormalized.

    ``bt`` folds that many images into each grid step as WIDE line FFTs
    ((n1, bt*t) operands — every leaf dot streams bt*t columns): the
    small-image form (r5, VERDICT r4 #5). A 256^2 image alone gives
    128 KB blocks and a launch/DMA-granularity-bound grid (the measured
    negative in benchmarks/exp_2d_big.py); folding 8 slabs restores
    1 MB blocks. This is what lets 256^3 route its (1,2)-axes pass
    through ONE kernel round-trip (see ``fused_cube_zone``)."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    # zone preconditions, asserted so a direct out-of-zone call fails
    # loud instead of flushing never-written output blocks (ph1/ph2 = 0)
    assert n1 % _ML_TILE == 0 and n2 % _ML_TILE == 0, (n1, n2)
    t = _ML_TILE                       # divides both pow2 dims >= 128
    ph1 = n2 // t                      # stage-1 column tiles
    ph2 = n1 // t                      # stage-2 line tiles
    keys1 = _ml_const_keys(n1)
    keys2 = _ml_const_keys(n2)
    consts1 = _ml_const_arrays(keys1, dtype)
    consts2 = _ml_const_arrays(keys2, dtype)
    nc1 = len(consts1)

    def kern(*refs):
        (ar, ai), rest = refs[:2], refs[2:]
        crefs = rest[:nc1 + len(consts2)]
        out_r, out_i, scr_r, scr_i = rest[nc1 + len(consts2):]
        cd1 = _unpack_consts(keys1, crefs[:nc1])
        cd2 = _unpack_consts(keys2, crefs[nc1:])
        i = pl.program_id(1)

        @pl.when(i < ph1)
        def _stage1():
            # column tile i: FFT each length-n1 column, stash (no
            # twiddle — this is the whole 2-D-vs-1-D difference).
            # bt > 1: ONE wide FFT over all folded images' columns
            xall_r = jnp.concatenate([ar[r] for r in range(bt)], axis=-1)
            xall_i = jnp.concatenate([ai[r] for r in range(bt)], axis=-1)
            yr, yi = _fft_axis0_traced(xall_r, xall_i, n1, cd1, mode)
            for r in range(bt):
                scr_r[r, i] = yr[:, r * t:(r + 1) * t]
                scr_i[r, i] = yi[:, r * t:(r + 1) * t]

        @pl.when(i >= ph1)
        def _stage2():
            j = i - ph1
            # line block (t, n2) per image: rows [j*t, j*t+t) of the
            # stage-1 result = that row range of every scratch chunk;
            # folded images join as extra lanes of one wide FFT
            cols = []
            for r in range(bt):
                br = jnp.concatenate(
                    [scr_r[r, c, pl.ds(j * t, t), :] for c in range(ph1)],
                    axis=1)
                bi = jnp.concatenate(
                    [scr_i[r, c, pl.ds(j * t, t), :] for c in range(ph1)],
                    axis=1)
                cols.append((br.T, bi.T))
            zr, zi = _fft_axis0_traced(
                jnp.concatenate([c[0] for c in cols], axis=-1),
                jnp.concatenate([c[1] for c in cols], axis=-1),
                n2, cd2, mode)
            for r in range(bt):
                # (t, n2): rows k1, lanes k2 — natural 2-D order
                out_r[r] = zr[:, r * t:(r + 1) * t].T
                out_i[r] = zi[:, r * t:(r + 1) * t].T

    data_in = pl.BlockSpec((bt, n1, t),
                           lambda b_, i: (b_, 0, jnp.minimum(i, ph1 - 1)),
                           memory_space=pltpu.VMEM)
    # stage-2 step j writes row block j; stage-1 steps revisit block 0
    # unwritten (same flushed-once-written pattern as _build_phased)
    data_out = pl.BlockSpec(
        (bt, t, n2), lambda b_, i: (b_, jnp.maximum(i - ph1, 0), 0),
        memory_space=pltpu.VMEM)

    def run(b, ar, ai):
        assert b % bt == 0, (b, bt)
        shapes = [jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2
        return pl.pallas_call(
            kern, grid=(b // bt, ph1 + ph2),
            in_specs=[data_in, data_in]
            + _const_vmem_specs(consts1) + _const_vmem_specs(consts2),
            out_specs=[data_out, data_out],
            out_shape=shapes,
            scratch_shapes=[pltpu.VMEM((bt, ph1, n1, t), jnp.float32)] * 2,
            cost_estimate=pl.CostEstimate(
                flops=32 * b * n1 * n2
                * max(1, (n1 * n2).bit_length() // 5),
                bytes_accessed=4 * 2 * b * n1 * n2 * 2,
                transcendentals=0),
            **({} if interpret else {"compiler_params":
                pltpu.CompilerParams(vmem_limit_bytes=100 * 1024 * 1024)}),
            interpret=interpret,
        )(ar, ai, *[jnp.asarray(c) for c in consts1],
          *[jnp.asarray(c) for c in consts2])

    return run


@functools.lru_cache(maxsize=None)
def _build_fft2_big(n1: int, n2: int, dtype: str = "float32",
                    interpret: bool = False, mode: str = "highest"):
    """TWO-call 2-D FFT pair for images beyond the one-call kernel's
    VMEM scratch (4096^2 = 2^24 points needs a 128 MB C-plane; the
    one-call `_build_fft2` caps at 2048^2 on the 1-pass tier). Stage A
    runs the length-n1 column FFTs in (n1, t) tiles; the (b, n1, n2)
    intermediate materializes once in HBM; stage B runs the length-n2
    row FFTs on (t, n2) line blocks and emits UNtransposed — natural
    image order, no twiddle anywhere (2-D = Bailey decomposition minus
    the inter-stage twiddle, exactly as `_build_fft2`). This is the
    size-unbounded N-D contract of the reference's strided line loops
    (/root/reference/src/ndfft.rs:114-153) at two HBM round-trips.
    Returns run(b, ar, ai) -> (yr, yi) on (b, n1, n2) planes."""
    import jax
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    assert n1 % _ML_TILE == 0 and n2 % _ML_TILE == 0, (n1, n2)
    t = _ML_TILE
    keys1 = _ml_const_keys(n1)
    keys2 = _ml_const_keys(n2)
    consts1 = _ml_const_arrays(keys1, dtype)
    consts2 = _ml_const_arrays(keys2, dtype)
    kw = {} if interpret else {"compiler_params": pltpu.CompilerParams(
        vmem_limit_bytes=100 * 1024 * 1024)}

    def sa_kern(ar, ai, *crefs):
        crs, (cr, ci) = crefs[:-2], crefs[-2:]
        cd = _unpack_consts(keys1, crs)
        yr, yi = _fft_axis0_traced(ar[0], ai[0], n1, cd, mode)
        cr[0] = yr
        ci[0] = yi

    def sb_kern(cr, ci, *crefs):
        crs, (xr_o, xi_o) = crefs[:-2], crefs[-2:]
        cd = _unpack_consts(keys2, crs)
        zr, zi = _fft_axis0_traced(cr[0].T, ci[0].T, n2, cd, mode)
        xr_o[0] = zr.T
        xi_o[0] = zi.T

    def run(b, ar, ai):
        col = pl.BlockSpec((1, n1, t), lambda i, j: (i, 0, j),
                           memory_space=pltpu.VMEM)
        row = pl.BlockSpec((1, t, n2), lambda i, j: (i, j, 0),
                           memory_space=pltpu.VMEM)
        cr, ci = pl.pallas_call(
            sa_kern, grid=(b, n2 // t),
            in_specs=[col, col] + _const_vmem_specs(consts1),
            out_specs=[col, col],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
            interpret=interpret, **kw,
        )(ar, ai, *[jnp.asarray(c) for c in consts1])
        return pl.pallas_call(
            sb_kern, grid=(b, n1 // t),
            in_specs=[row, row] + _const_vmem_specs(consts2),
            out_specs=[row, row],
            out_shape=[jax.ShapeDtypeStruct((b, n1, n2), jnp.float32)] * 2,
            interpret=interpret, **kw,
        )(cr, ci, *[jnp.asarray(c) for c in consts2])

    return run


def fused_fft2_big_planes(xr, xi, inverse: bool = False,
                          interpret: bool = False):
    """2-D DFT over the last two dims via the two-call beyond-VMEM
    pair (zone-gated by ``fused_2d_big_zone``); leading dims fold into
    the batch grid. Inverse is UNNORMALIZED (caller scales)."""
    n1, n2 = xr.shape[-2], xr.shape[-1]
    batch = xr.shape[:-2]
    b = 1
    for s in batch:
        b *= s
    run = _build_fft2_big(n1, n2, "float32", interpret,
                          _kernel_precision())
    ar = xr.reshape(b, n1, n2)
    ai = xi.reshape(b, n1, n2)
    if inverse:
        yr, yi = run(b, ar, -ai)
        return yr.reshape(xr.shape), -yi.reshape(xr.shape)
    yr, yi = run(b, ar, ai)
    return yr.reshape(xr.shape), yi.reshape(xr.shape)


def fused_2d_big_zone(shape: tuple, axes: tuple) -> bool:
    """True when the two-call pair serves this transform: last two dims
    transformed, both pow2 in [128, 8192], per-image points ABOVE the
    one-call zone's per-tier cap (the one-call kernel wins everywhere
    it fits) up to 2^26. Measured v5e at 4096^2, leaf-128 lines
    (benchmarks/exp_2d_big.py): two-call 2198 us `highest` / 995
    `default` vs jnp.fftn 4436 — 2.0x / 4.5x."""
    nd = len(shape)
    if nd < 2 or len(axes) != 2:
        return False
    if sorted(a % nd for a in axes) != [nd - 2, nd - 1]:
        return False
    n1, n2 = shape[-2], shape[-1]
    for s in (n1, n2):
        if s & (s - 1) or not (128 <= s <= 8192):
            return False
    lo = _FUSED_2D_MAX_POINTS if _kernel_precision() == "default" \
        else (1 << 20)
    return lo < n1 * n2 <= (1 << 26)


def fused_fft2_planes(xr, xi, inverse: bool = False,
                      interpret: bool = False):
    """2-D DFT over the last two dims via the phased 2-D kernel
    (zone-gated by ``fused_2d_zone``); leading dims fold into the batch
    grid. Inverse is UNNORMALIZED (caller scales), via the conjugation
    identity."""
    shape = xr.shape
    n1, n2 = shape[-2], shape[-1]
    b = 1
    for s in shape[:-2]:
        b *= s
    ar = xr.reshape(b, n1, n2)
    ai = xi.reshape(b, n1, n2)
    run = _build_fft2(n1, n2, str(xr.dtype), interpret,
                      _kernel_precision())
    if inverse:
        yr, yi = run(b, ar, -ai)
        yi = -yi
    else:
        yr, yi = run(b, ar, ai)
    return yr.reshape(shape), yi.reshape(shape)
