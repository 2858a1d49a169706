"""Dev driver CLI (the reference's ``xtask`` equivalent, component 27).

The reference xtask detects host CPU capabilities and computes feature
flags/RUSTFLAGS (``xtask/src/lib.rs:25-111``); here the analogous detection
is the JAX platform/device topology, and the subcommands wrap the dev
workflows: info / test / bench / lint / sanity / update-bench-readme.
"""

from __future__ import annotations

import argparse
import json
import subprocess
import sys
from pathlib import Path

REPO = Path(__file__).resolve().parent


def cmd_info(_args) -> int:
    import jax
    print(f"platform:  {jax.default_backend()}")
    devs = jax.devices()
    print(f"devices:   {len(devs)} x {devs[0].device_kind if devs else '-'}")
    print(f"jax:       {jax.__version__}")
    from kofft_tpu.config import get_config
    cfg = get_config()
    print(f"backend:   {cfg.backend} (pallas enabled: {cfg.enable_pallas})")
    print(f"dft_cutoff: {cfg.dft_cutoff}  precision: {cfg.precision}  "
          f"shard_threshold: {cfg.shard_threshold}")
    if len(devs) > 1:
        print(f"suggested mesh: 1-D ({len(devs)},) axis 'd'")
    return 0


def cmd_test(args) -> int:
    cmd = [sys.executable, "-m", "pytest", "tests/", "-q"]
    if args.k:
        cmd += ["-k", args.k]
    if args.x:
        cmd += ["-x"]
    return subprocess.call(cmd, cwd=REPO)


def cmd_bench(_args) -> int:
    return subprocess.call([sys.executable, "bench.py"], cwd=REPO)


def cmd_chipcheck(args) -> int:
    """Real-size numeric parity ON THE ATTACHED ACCELERATOR: the CPU
    test mesh caps interpret-mode parity at 2^15; this drives the
    public API at 2^14..2^26 plus smooth odd*2^k sizes and the fused
    N-D zones (128^3, 512^2, 2048^2, 4096^2, 256^3) on the real chip
    and reports SNR vs the
    float64 oracle (>= 130 dB = the phased kernel's scratch
    choreography is correct at real sizes). With ``--record`` the
    results land in benchmarks/chipcheck.json (platform + per-size SNR
    rows) so the evidence is committable, mirroring the bench-history
    workflow."""
    code = """
import json, sys
import numpy as np, jax, jax.numpy as jnp
import kofft_tpu as kt
from kofft_tpu.ops.dft import snr_db
rng = np.random.default_rng(11)
ok = True
rows = []
for n in ([1 << p for p in (14, 16, 18, 20, 21, 22, 23, 24, 25, 26)]
          + [3 << 18, 5 << 16]):
    xr = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    xi = jnp.asarray(rng.standard_normal(n).astype(np.float32))
    yr, yi = kt.fft_split(xr, xi)
    ref = np.fft.fft(np.asarray(xr).astype(np.float64)
                     + 1j * np.asarray(xi).astype(np.float64))
    s = snr_db(ref, np.asarray(yr) + 1j * np.asarray(yi))
    hr, hi = kt.rfft_split(xr)
    sr = snr_db(np.fft.rfft(np.asarray(xr).astype(np.float64)),
                np.asarray(hr) + 1j * np.asarray(hi))
    print(f"n={n}: complex {s:.1f} dB, rfft {sr:.1f} dB")
    rows.append({"n": n, "complex_snr_db": round(float(s), 1),
                 "rfft_snr_db": round(float(sr), 1)})
    ok &= s > 130 and sr > 130
from kofft_tpu.ops import ndfft as NF
for shape in [(128, 128, 128), (512, 512), (2048, 2048), (4096, 4096),
              (256, 256, 256)]:
    ar = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    ai = jnp.asarray(rng.standard_normal(shape).astype(np.float32))
    br, bi = NF.fftn_split(ar, ai)
    rn = np.fft.fftn(np.asarray(ar).astype(np.float64)
                     + 1j * np.asarray(ai).astype(np.float64))
    sn = snr_db(rn, np.asarray(br) + 1j * np.asarray(bi))
    print(f"fftn {shape}: {sn:.1f} dB")
    rows.append({"n": "x".join(map(str, shape)),
                 "fftn_snr_db": round(float(sn), 1)})
    ok &= sn > 130
if "--record" in sys.argv[1:]:
    out = {"platform": jax.default_backend(),
           "device": jax.devices()[0].device_kind,
           "threshold_db": 130, "ok": bool(ok), "rows": rows}
    with open("benchmarks/chipcheck.json", "w") as f:
        json.dump(out, f, indent=1)
    print("wrote benchmarks/chipcheck.json")
print("chipcheck:", "OK" if ok else "FAILED")
raise SystemExit(0 if ok else 1)
"""
    cmd = [sys.executable, "-c", code]
    if getattr(args, "record", False):
        cmd.append("--record")
    return subprocess.call(cmd, cwd=REPO)


def cmd_coverage(_args) -> int:
    """Vendored stdlib-only 90% line-coverage gate (writes
    benchmarks/coverage.json)."""
    return subprocess.call(
        [sys.executable, "tools/coverage_gate.py", "--fail-under", "90"],
        cwd=REPO)


def cmd_lint(_args) -> int:
    """Byte-compile every source file (import-safety gate) and require a
    clean git tree — round artifacts (BENCH/MULTICHIP JSONs, probe outs)
    must be committed, not drift untracked (VERDICT r4 #8). The analog
    of the reference xtask's fmt/clippy gate (xtask/src/main.rs:12-60)."""
    import compileall
    ok = compileall.compile_dir(str(REPO / "kofft_tpu"), quiet=1)
    ok &= compileall.compile_file(str(REPO / "bench.py"), quiet=1)
    ok &= compileall.compile_file(str(REPO / "tasks.py"), quiet=1)
    dirty = subprocess.run(
        ["git", "status", "--porcelain"], cwd=REPO,
        capture_output=True, text=True).stdout.strip()
    if dirty:
        print("lint: dirty tree (commit round artifacts):")
        print(dirty)
        ok = False
    print("lint:", "OK" if ok else "FAILED")
    return 0 if ok else 1


def cmd_sanity(args) -> int:
    """Synthesize a tone and render a spectrogram PNG (smoke test)."""
    import numpy as np
    from kofft_tpu.utils.audio import write_wav
    out_dir = Path(args.out or (REPO / "target"))
    out_dir.mkdir(parents=True, exist_ok=True)
    wav = out_dir / "tone.wav"
    sr = 16000
    t = np.arange(sr * 2) / sr
    write_wav(wav, 0.5 * np.sin(2 * np.pi * 440 * t)
              + 0.25 * np.sin(2 * np.pi * 2000 * t), sr)
    png = out_dir / "tone.png"
    rc = subprocess.call(
        [sys.executable, "-m", "kofft_tpu.cli.sanity_check", str(wav),
         str(png)], cwd=REPO)
    if rc == 0:
        print(f"wrote {png}")
    return rc


def cmd_web(args) -> int:
    """Serve the streaming spectrogram app (reference ``xtask
    web-spectrogram``, ``xtask/src/main.rs``)."""
    from kofft_tpu.web.server import make_server
    srv = make_server(args.port)
    host, port = srv.server_address[:2]
    print(f"spectrogram app on http://{host}:{port} (ctrl-c to stop)")
    try:
        srv.serve_forever()
    except KeyboardInterrupt:
        pass
    finally:
        srv.shutdown()
    return 0


def cmd_examples(_args) -> int:
    """Run every example (smoke; the CI examples job's local twin)."""
    import subprocess
    rc = 0
    for ex in sorted((REPO / "examples").glob("*.py")):
        print(f"== {ex.name}")
        r = subprocess.run([sys.executable, str(ex)])
        rc = rc or r.returncode
    return rc


def cmd_update_bench_readme(_args) -> int:
    """Regenerate the benchmark table in benchmarks/README.md from
    latest.json (reference update_bench_readme.rs:33-82)."""
    latest = REPO / "benchmarks" / "latest.json"
    if not latest.exists():
        print("no benchmarks/latest.json — run `python tasks.py bench`")
        return 1
    doc = json.loads(latest.read_text())
    env = doc["environment"]
    lines = [
        "# kofft-tpu benchmarks",
        "",
        f"Environment: {env['platform']} ({', '.join(env['devices'])}), "
        f"jax {env['jax_version']}, run {env['timestamp']}.",
        "",
        "| Library | Transform | N | Mode | Time/op | Ops/sec | SNR | vs prev |",
        "|---|---|---|---|---|---|---|---|",
    ]
    for r in doc["records"]:
        tpo = r["time_per_op_ns"]
        t = (f"{tpo / 1e6:.3f} ms" if tpo >= 1e6 else f"{tpo / 1e3:.1f} us")
        chg = ("" if r.get("change_vs_prev") is None
               else f"{r['change_vs_prev'] * 100:+.1f}%")
        snr = ("" if r.get("snr_db") is None else f"{r['snr_db']:.1f} dB")
        lines.append(f"| {r['library']} | {r['transform']} | {r['size']} | "
                     f"{r['mode']} | {t} | {r['ops_per_sec']:.1f} | {snr} "
                     f"| {chg} |")
    (REPO / "benchmarks" / "README.md").write_text("\n".join(lines) + "\n")
    print("benchmarks/README.md updated")
    return 0


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="tasks.py")
    sub = p.add_subparsers(dest="cmd", required=True)
    sub.add_parser("info")
    t = sub.add_parser("test")
    t.add_argument("-k", default=None)
    t.add_argument("-x", action="store_true")
    sub.add_parser("bench")
    c = sub.add_parser("chipcheck")
    c.add_argument("--record", action="store_true")
    sub.add_parser("coverage")
    sub.add_parser("lint")
    s = sub.add_parser("sanity")
    s.add_argument("--out", default=None)
    sub.add_parser("update-bench-readme")
    w = sub.add_parser("web")
    w.add_argument("--port", type=int, default=3000)
    sub.add_parser("examples")
    args = p.parse_args(argv)
    return {"info": cmd_info, "test": cmd_test, "bench": cmd_bench,
            "chipcheck": cmd_chipcheck, "coverage": cmd_coverage,
            "lint": cmd_lint, "sanity": cmd_sanity,
            "update-bench-readme": cmd_update_bench_readme,
            "web": cmd_web, "examples": cmd_examples}[args.cmd](args)


if __name__ == "__main__":
    raise SystemExit(main())
