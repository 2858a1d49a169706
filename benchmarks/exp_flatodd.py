"""r5 probe: lift the Mosaic flat-output restriction for odd n1
(VERDICT r4 #7).

The phased flat phase-3 emits rank-1 (w,) blocks via a (tk, n1) ->
(tk*n1,) in-kernel reshape, which Mosaic's 1-D shape-cast inference
rejects for n1 not a multiple of 1024 (768, 256 fail; 1024, 2048 pass).
Hypothesis: emitting (w/128, 128) RANK-2 blocks (minor dim stays a full
lane vector) lowers for any n1 % 128 == 0, and the caller-side
(m/128, 128) -> (m,) reshape is cheap/free (both layouts tile to the
same (8, 128) vreg order).

Stage A: does the reshape lower? A minimal kernel per n1 in
{768, 640, 256, 1024}. Stage B: what does the XLA rank-2 -> rank-1
reshape cost at 3*2^18? (If ~free, integrating into the flat phase
saves the ~10-15 us relayout tax on smooth odd sizes.)

Run: python benchmarks/exp_flatodd.py
"""
from __future__ import annotations

import pathlib
import sys

sys.path.insert(0, str(pathlib.Path(__file__).resolve().parent.parent))

import numpy as np


def log(*a):
    print(*a, file=sys.stderr, flush=True)


def main():
    import jax
    import jax.numpy as jnp
    from jax.experimental import pallas as pl
    from jax.experimental.pallas import tpu as pltpu

    from kofft_tpu.bench import timeit_chained
    from kofft_tpu.utils.observability import enable_compilation_cache

    enable_compilation_cache()
    tk = 128

    # --- stage A: does (tk, n1) -> (tk*n1/128, 128) lower per n1? -----
    for n1 in (768, 640, 256, 1024):
        w = tk * n1
        rows = w // 128

        def kern(x_ref, y_ref):
            y_ref[...] = x_ref[...].reshape(rows, 128)

        try:
            f = pl.pallas_call(
                kern,
                in_specs=[pl.BlockSpec((tk, n1), lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((rows, 128), lambda: (0, 0),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((rows, 128), jnp.float32),
            )
            x = jnp.asarray(
                np.arange(tk * n1, dtype=np.float32).reshape(tk, n1))
            y = np.asarray(f(x))
            ok = np.array_equal(y.reshape(-1),
                                np.arange(tk * n1, dtype=np.float32))
            log(f"n1={n1}: rank-2 reshape lowers, values {'OK' if ok else 'WRONG'}")
        except Exception as e:
            log(f"n1={n1}: FAILED {type(e).__name__}: {str(e)[:120]}")

        # rank-1 control (expected to fail for 768/640/256)
        def kern1(x_ref, y_ref):
            y_ref[...] = x_ref[...].reshape(w)

        try:
            f1 = pl.pallas_call(
                kern1,
                in_specs=[pl.BlockSpec((tk, n1), lambda: (0, 0),
                                       memory_space=pltpu.VMEM)],
                out_specs=pl.BlockSpec((w,), lambda: (0,),
                                       memory_space=pltpu.VMEM),
                out_shape=jax.ShapeDtypeStruct((w,), jnp.float32),
            )
            x = jnp.asarray(np.ones((tk, n1), np.float32))
            np.asarray(f1(x))
            log(f"n1={n1}: rank-1 reshape lowers too")
        except Exception as e:
            log(f"n1={n1}: rank-1 reshape rejected ({type(e).__name__})")

    # --- stage B: XLA (m/128, 128) -> (m,) reshape cost at 3*2^18 -----
    m = 3 << 18
    a = jnp.asarray(np.random.default_rng(0)
                    .standard_normal((m // 128, 128)).astype(np.float32))

    def resh(q):
        return ((q[0].reshape(m) * 1e-3).reshape(m // 128, 128),)

    t = timeit_chained(resh, (a,), iters=100)
    log(f"XLA (m/128,128)->(m,)->back roundtrip at m=3*2^18: "
        f"{t*1e6:.2f} us (per direction ~{t*1e6/2:.2f})")


if __name__ == "__main__":
    main()
