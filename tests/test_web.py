"""Web service tests (reference axum router tests, web-spectrogram/src/
main.rs:35-124: static serving, CORS, SPA fallback, /health; plus the WASM
streaming contract, lib.rs:340-360)."""

import json
import urllib.error
import urllib.request

import numpy as np
import pytest

from kofft_tpu.web import StreamingSpectrogram
from kofft_tpu.web.server import serve_background


@pytest.fixture(scope="module")
def server():
    srv, port = serve_background(0)
    yield f"http://127.0.0.1:{port}"
    srv.shutdown()


def _get(url):
    with urllib.request.urlopen(url, timeout=30) as r:
        return r.status, dict(r.headers), r.read()


def _post(url, obj):
    req = urllib.request.Request(
        url, data=json.dumps(obj).encode(),
        headers={"Content-Type": "application/json"}, method="POST")
    with urllib.request.urlopen(req, timeout=60) as r:
        return r.status, json.loads(r.read())


def test_streaming_state_contract():
    """Short pushes return empty; after win_len samples a full RGBA row;
    hop-sized drain (reference lib.rs:211-234, :353)."""
    st = StreamingSpectrogram()
    assert st.compute_frame(np.zeros(512, np.float32)).size == 0
    row = st.compute_frame(np.random.randn(512).astype(np.float32))
    assert row.shape == (512 * 4,)
    assert np.all(row[3::4] == 255)  # alpha
    # next hop yields another row immediately (buffer keeps win - hop)
    row2 = st.compute_frame(np.random.randn(512).astype(np.float32))
    assert row2.shape == (512 * 4,)


def test_streaming_running_max_monotone():
    st = StreamingSpectrogram()
    st.compute_frame(0.01 * np.random.randn(1024).astype(np.float32))
    m1 = st._max_mag
    st.compute_frame(10.0 * np.random.randn(512).astype(np.float32))
    assert st._max_mag >= m1


def test_health(server):
    status, headers, _ = _get(server + "/health")
    assert status == 200
    assert headers.get("Access-Control-Allow-Origin") == "*"


def test_static_index_and_spa_fallback(server):
    status, _, body = _get(server + "/")
    assert status == 200 and b"spectrogram" in body
    # unknown path falls back to index.html (SPA)
    status, _, body2 = _get(server + "/some/client/route")
    assert status == 200 and body2 == body


def test_api_compute_frame(server):
    status, out = _post(server + "/api/compute_frame",
                        {"samples": [0.0] * 512})
    assert status == 200 and out["row"] == []
    status, out = _post(server + "/api/compute_frame",
                        {"samples": list(np.random.randn(512))})
    assert status == 200
    assert len(out["row"]) == 512 * 4


def test_api_stft_and_errors(server):
    sig = list(np.sin(np.arange(256) * 0.3))
    status, out = _post(server + "/api/stft",
                        {"samples": sig, "win_len": 64, "hop": 16})
    assert status == 200
    assert len(out["mags"]) == 16 and len(out["mags"][0]) == 32
    assert out["max_mag"] > 0
    with pytest.raises(urllib.error.HTTPError):
        _post(server + "/api/stft", {"samples": sig, "win_len": 64,
                                     "hop": 0})


def test_api_set_colormap_reset(server):
    assert _post(server + "/api/set_colormap", {"name": "viridis"})[1]["ok"]
    assert _post(server + "/api/reset", {})[1]["ok"]



def test_service_worker_served(server):
    """sw.js ships with the shell and the right MIME (a SW must be
    served as JS from the app scope to register) — reference PWA parity
    (web-spectrogram/sw.js)."""
    status, headers, body = _get(server + "/sw.js")
    assert status == 200
    assert headers.get("Content-Type") == "text/javascript"
    assert b"addEventListener(\"install\"" in body
    assert b"addEventListener(\"fetch\"" in body


def test_service_worker_shell_entries_resolvable(server):
    """Every precache SHELL entry in sw.js must actually be servable AS
    ITSELF — the SPA fallback answers 200 (index.html) for any path, so
    status alone proves nothing; a renamed asset must fail here, not
    silently precache index.html under the wrong URL."""
    import re
    _, _, index_body = _get(server + "/index.html")
    _, _, body = _get(server + "/sw.js")
    entries = re.findall(r'"\./([^"]*)"', body.decode())
    assert entries, "sw.js must declare precache shell entries"
    for e in entries:
        status, headers, ebody = _get(server + "/" + e)
        assert status == 200, f"shell entry {e!r} not servable"
        if e not in ("", "index.html"):
            assert ebody != index_body, (
                f"shell entry {e!r} resolved to the SPA index fallback — "
                f"the real asset is missing")


def test_service_worker_never_caches_api():
    """API POST endpoints are stateful (streaming frames) and must be
    excluded from the cache policy."""
    from pathlib import Path
    sw = (Path(__file__).parent.parent / "kofft_tpu" / "web" / "static"
          / "sw.js").read_text()
    assert "/api/" in sw and "network only" in sw
    assert 'req.method !== "GET"' in sw


def test_app_registers_service_worker():
    from pathlib import Path
    app = (Path(__file__).parent.parent / "kofft_tpu" / "web" / "static"
           / "app.mjs").read_text()
    assert "serviceWorker" in app and "register" in app


def test_streaming_state_chunked_multi_row():
    """A push that completes k frames returns k RGBA rows from ONE
    device launch (the chunked path wired per VERDICT r2 item 4), with
    the running max applied sequentially per frame."""
    x = np.random.randn(1024 + 2 * 512).astype(np.float32)
    st = StreamingSpectrogram()
    rows = st.compute_frame(x)
    assert rows.shape == (3 * 512 * 4,)            # 3 completed frames
    assert np.all(rows[3::4] == 255)               # alpha everywhere
    # per-hop pushes on a fresh state paint the SAME pixels: the batched
    # path preserves the reference's frame-at-a-time running-max
    st2 = StreamingSpectrogram()
    seq = [st2.compute_frame(x[i: i + 512]) for i in range(0, x.size, 512)]
    # +-1 LSB: the batched and per-frame FFT launches round f32 slightly
    # differently, which can flip a dB value sitting on a u8 boundary
    diff = np.abs(np.concatenate(seq).astype(np.int16)
                  - rows.astype(np.int16))
    assert diff.max() <= 1


def test_api_error_paths(server):
    """400s: invalid json, non-dict body, bad colormap; 404 unknown."""
    import urllib.error
    import urllib.request
    req = urllib.request.Request(
        server + "/api/compute_frame", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    req = urllib.request.Request(
        server + "/api/compute_frame", data=b"[1,2,3]",
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 400"
    except urllib.error.HTTPError as e:
        assert e.code == 400
    # unknown colormap names fall back to Fire (reference
    # Colormap::parse semantics) — the endpoint still answers ok
    status, out = _post(server + "/api/set_colormap", {"name": "nope"})
    assert status == 200 and out["ok"]
    req = urllib.request.Request(
        server + "/api/nonexistent", data=b"{}",
        headers={"Content-Type": "application/json"}, method="POST")
    try:
        urllib.request.urlopen(req, timeout=30)
        assert False, "expected 404"
    except urllib.error.HTTPError as e:
        assert e.code == 404


def test_app_routes_table():
    from kofft_tpu.web.server import app_routes
    routes = app_routes()
    assert routes["/health"] == "health"
    assert "/api/stft" in routes and routes["/"] == "static"


def test_options_preflight(server):
    import urllib.request
    req = urllib.request.Request(server + "/api/stft", method="OPTIONS")
    with urllib.request.urlopen(req, timeout=10) as r:
        assert r.status == 204
        assert r.headers.get("Access-Control-Allow-Origin") == "*"


def test_api_error_paths_return_400(server):
    # compute_frame with malformed samples (ragged) -> handler -> 400
    with pytest.raises(urllib.error.HTTPError) as ei:
        _post(server + "/api/compute_frame", {"samples": [[1.0], [1, 2]]})
    assert ei.value.code == 400
    assert "error" in json.loads(ei.value.read().decode())
    # unknown palette names FALL BACK to Fire (reference
    # Colormap::parse, spectrogram.rs:34-45) — not an error
    assert _post(server + "/api/set_colormap",
                 {"name": "no-such-map"})[1]["ok"]
    # malformed json body -> 400
    req = urllib.request.Request(
        server + "/api/set_colormap", data=b"{not json",
        headers={"Content-Type": "application/json"}, method="POST")
    with pytest.raises(urllib.error.HTTPError) as ei3:
        urllib.request.urlopen(req, timeout=10)
    assert ei3.value.code == 400


def test_local_fallback_matches_python_pipeline():
    """local.mjs (the in-browser offline compute path, reference WASM
    client parity web-spectrogram/src/lib.rs:70-252) must track the
    Python pipeline's contract constants and palette stops — no node in
    CI, so this parses the module text as a drift tripwire."""
    import pathlib
    import re
    from kofft_tpu.web import state as S
    from kofft_tpu.visual import spectrogram as V
    src = (pathlib.Path(S.__file__).parent / "static" /
           "local.mjs").read_text()
    assert f"WIN_LEN = {S.WIN_LEN}" in src
    assert f"HOP = {S.HOP}" in src
    assert f"FLOOR_DB = {S.FLOOR_DB}" in src
    # palette stops mirror visual/spectrogram.py exactly
    body = src[src.index("const STOPS"):src.index("};") + 1]
    starts = {name: body.index(name + ":") for name in ("fire", "rainbow")}
    bounds = sorted(starts.values()) + [len(body)]
    for stops, name in ((V._RAINBOW_STOPS, "rainbow"),
                        (V._FIRE_STOPS, "fire")):
        s0 = starts[name]
        s1 = min(b for b in bounds if b > s0)
        got = re.findall(r"\[([\d.]+), \[(\d+), (\d+), (\d+)\]\]",
                         body[s0:s1])
        assert [(float(p), (int(r), int(g), int(b)))
                for p, r, g, b in got] == stops, name
    # running-max init matches state.py (1e-12)
    assert "1e-12" in src


def test_app_offline_fallback_wiring():
    """app.mjs must import the local module, probe /health, and fall
    back to in-browser compute on a failed compute POST."""
    import pathlib
    from kofft_tpu.web import state as S
    src = (pathlib.Path(S.__file__).parent / "static" /
           "app.mjs").read_text()
    assert 'from "./local.mjs"' in src
    assert "/health" in src
    assert "goLocal" in src
    sw = (pathlib.Path(S.__file__).parent / "static" /
          "sw.js").read_text()
    assert "./local.mjs" in sw  # offline shell caches the compute path
