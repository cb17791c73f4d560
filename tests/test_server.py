"""HTTP scoring server tests: a resident SIMCAScorer behind
ThreadingHTTPServer answers /score with decisions identical to the
direct API, both payload formats round-trip, malformed requests get
clean 400s, and concurrent posts serialize correctly.

The reference has no serving layer (SURVEY.md section 5 — drivers score
in-process and exit); ocm_tpu/server.py is the deployment surface, so
these tests are its contract.
"""

import io
import json
import os
import threading
import time
import urllib.error
import urllib.request

import jax.numpy as jnp
import numpy as np
import pytest

from ocm_tpu.models.simca import fit_classes
from ocm_tpu.server import ScoringServer
from ocm_tpu.serving import SIMCAScorer
from ocm_tpu.utils.synthetic import cheese_like

L = 48


@pytest.fixture(scope="module")
def data():
    return cheese_like(seed=11, n_per_class=50, length=L, n_classes=3)


@pytest.fixture(scope="module")
def server(data):
    x_tr, y_tr, _, _ = data
    model = fit_classes(jnp.asarray(x_tr), y_tr, [0, 1, 2],
                        n_components=5)
    scorer = SIMCAScorer(model, chunk_size=64)
    srv = ScoringServer(scorer, info={"kind": "simca",
                                      "class_labels": [0, 1, 2],
                                      "input_length": L},
                        expected_length=L).start()
    yield srv, scorer
    srv.stop()


def _url(srv, path):
    return f"http://{srv.host}:{srv.port}{path}"


def _post(srv, body, ctype, accept=None):
    req = urllib.request.Request(_url(srv, "/score"), data=body,
                                 headers={"Content-Type": ctype,
                                          **({"Accept": accept}
                                             if accept else {})})
    return urllib.request.urlopen(req, timeout=60)


def test_health_and_info(server):
    srv, _ = server
    with urllib.request.urlopen(_url(srv, "/health"), timeout=30) as r:
        h = json.loads(r.read())
    assert h["status"] == "ok" and h["uptime_s"] >= 0
    with urllib.request.urlopen(_url(srv, "/info"), timeout=30) as r:
        info = json.loads(r.read())
    assert info["class_labels"] == [0, 1, 2]


def test_score_json_parity(server, data):
    srv, scorer = server
    _, _, x_ts, _ = data
    x = np.asarray(x_ts[:20], np.float32)
    body = json.dumps({"x": x.tolist()}).encode()
    with _post(srv, body, "application/json") as r:
        out = json.loads(r.read())
    direct = scorer.score(x)
    np.testing.assert_array_equal(np.asarray(out["accept"]),
                                  np.asarray(direct["accept"]))
    np.testing.assert_allclose(np.asarray(out["dred"]),
                               np.asarray(direct["dred"], np.float64),
                               rtol=1e-6)


def test_score_npz_roundtrip(server, data):
    srv, scorer = server
    _, _, x_ts, _ = data
    x = np.asarray(x_ts[:33], np.float32)
    buf = io.BytesIO()
    np.savez(buf, x=x)
    with _post(srv, buf.getvalue(), "application/x-npz",
               accept="application/x-npz") as r:
        assert r.headers["Content-Type"] == "application/x-npz"
        out = np.load(io.BytesIO(r.read()))
    direct = scorer.score(x)
    np.testing.assert_array_equal(out["accept"], direct["accept"])
    assert out["accept"].shape == (33, 3)


def test_single_spectrum_promoted(server, data):
    srv, _ = server
    _, _, x_ts, _ = data
    body = json.dumps({"x": np.asarray(x_ts[0]).tolist()}).encode()
    with _post(srv, body, "application/json") as r:
        out = json.loads(r.read())
    assert np.asarray(out["accept"]).shape == (1, 3)


@pytest.mark.parametrize("body,ctype,msg", [
    (b"", "application/json", "empty request body"),
    (b"{\"y\": []}", "application/json", "bad JSON"),
    (b"garbage-bytes", "application/octet-stream", "neither npz"),
])
def test_bad_payloads_400(server, body, ctype, msg):
    srv, _ = server
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(srv, body, ctype)
    assert exc.value.code == 400
    assert msg in json.loads(exc.value.read())["error"]


def test_wrong_length_400_and_route_404(server):
    srv, _ = server
    body = json.dumps({"x": [[0.0] * (L + 1)]}).encode()
    with pytest.raises(urllib.error.HTTPError) as exc:
        _post(srv, body, "application/json")
    assert exc.value.code == 400
    assert f"expects L={L}" in json.loads(exc.value.read())["error"]

    with pytest.raises(urllib.error.HTTPError) as exc:
        urllib.request.urlopen(_url(srv, "/nope"), timeout=30)
    assert exc.value.code == 404


def test_concurrent_posts_serialize(server, data):
    srv, scorer = server
    _, _, x_ts, _ = data
    x = np.asarray(x_ts[:16], np.float32)
    expected = np.asarray(scorer.score(x)["accept"])
    results, errors = [None] * 6, []

    def worker(i):
        try:
            body = json.dumps({"x": x.tolist()}).encode()
            with _post(srv, body, "application/json") as r:
                results[i] = np.asarray(json.loads(r.read())["accept"])
        except Exception as e:  # surface in the main thread
            errors.append(e)

    threads = [threading.Thread(target=worker, args=(i,))
               for i in range(6)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=120)
    assert not errors
    for r in results:
        np.testing.assert_array_equal(r, expected)
    assert srv.n_scored >= 6 * 16


def test_scorer_failure_returns_500():
    """A scorer exception must surface as a 500 with the error text, not
    a dropped connection (review fix)."""

    class Boom:
        def score(self, x):
            raise RuntimeError("device fell over")

    srv = ScoringServer(Boom(), info={}).start()
    try:
        body = json.dumps({"x": [[1.0, 2.0]]}).encode()
        with pytest.raises(urllib.error.HTTPError) as exc:
            _post(srv, body, "application/json")
        assert exc.value.code == 500
        err = json.loads(exc.value.read())["error"]
        assert "RuntimeError" in err and "device fell over" in err
    finally:
        srv.stop()


def test_build_scorer_run_dir_and_warmup(tmp_path, data):
    """cli._build_scorer -> ScoringServer over a real run dir (the
    `serve` command's wiring, minus serve_forever)."""
    from ocm_tpu import cli
    from ocm_tpu.models.simca import fit_simca

    x_tr, y_tr, x_ts, _ = data
    model = fit_simca(jnp.asarray(x_tr[y_tr == 0]), 5)
    run_dir = str(tmp_path / "run")
    import os

    os.makedirs(run_dir)
    cli._save_simca_model(run_dir, model,
                          {"kind": "simca", "stacked": False,
                           "class_labels": [0], "decision_type": "alt",
                           "n_components": 5, "t2lim": "Fdist",
                           "qlim": "jm"})
    scorer, info = cli._build_scorer(run_dir, chunk_size=64)
    assert info["kind"] == "simca" and info["input_length"] == L
    srv = ScoringServer(scorer, info,
                        expected_length=info["input_length"]).start()
    try:
        srv.warmup()
        body = json.dumps({"x": np.asarray(x_ts[:5]).tolist()}).encode()
        with _post(srv, body, "application/json") as r:
            out = json.loads(r.read())
        assert len(out["accept"]) == 5
    finally:
        srv.stop()


def test_queue_overflow_429():
    """At most max_queue requests may hold/wait for the device; the
    overflow request gets an immediate 429 (bounded queueing, not an
    unbounded thread pile-up), and the gate releases afterwards."""
    gate = threading.Event()
    started = threading.Event()

    class Slow:
        def score(self, x):
            started.set()
            assert gate.wait(timeout=60)
            return {"accept": np.ones(len(x), bool)}

    srv = ScoringServer(Slow(), info={}, max_queue=2).start()
    body = json.dumps({"x": [[1.0, 2.0]]}).encode()
    codes, lock = [], threading.Lock()

    def worker():
        try:
            with _post(srv, body, "application/json") as r:
                with lock:
                    codes.append(r.status)
        except urllib.error.HTTPError as e:
            with lock:
                codes.append(e.code)
            e.close()

    try:
        threads = [threading.Thread(target=worker) for _ in range(3)]
        threads[0].start()
        assert started.wait(timeout=30)   # one request holds the device
        threads[1].start()                # fills the last queue slot...
        # ...wait until it occupies the slot (429 arrival proves overflow)
        deadline = time.time() + 30
        threads[2].start()
        while time.time() < deadline:
            with lock:
                if 429 in codes:
                    break
            time.sleep(0.02)
        gate.set()
        for t in threads:
            t.join(timeout=60)
        assert sorted(codes) == [200, 200, 429], codes
        assert srv.n_rejected == 1
        # the slots were released: a fresh request succeeds
        with _post(srv, body, "application/json") as r:
            assert r.status == 200
    finally:
        gate.set()
        srv.stop()


def test_reload_endpoint_swaps_scorer():
    """POST /reload swaps the resident scorer (stream-fit refresh path):
    decisions flip to the new model, /info updates, a failed reload
    keeps the old scorer serving, and no reload_fn means 501."""

    class Const:
        def __init__(self, v):
            self.v = v

        def score(self, x):
            return {"accept": np.full(len(x), self.v, bool)}

    def mk_reload(calls):
        def reload_fn(model_dir):
            calls.append(model_dir)
            if model_dir == "broken":
                raise FileNotFoundError("no such run dir")
            return Const(False), {"kind": "v2", "input_length": 2}, 2
        return reload_fn

    calls = []
    srv = ScoringServer(Const(True), info={"kind": "v1"},
                        reload_fn=mk_reload(calls)).start()
    body = json.dumps({"x": [[1.0, 2.0]]}).encode()
    try:
        with _post(srv, body, "application/json") as r:
            assert json.loads(r.read())["accept"] == [True]

        req = urllib.request.Request(
            _url(srv, "/reload"), data=b"",
            headers={"Content-Type": "application/json"})
        with urllib.request.urlopen(req, timeout=60) as r:
            out = json.loads(r.read())
        assert out["status"] == "reloaded" and out["info"]["kind"] == "v2"
        assert calls == [None]            # empty body -> reload in place

        with _post(srv, body, "application/json") as r:
            assert json.loads(r.read())["accept"] == [False]
        with urllib.request.urlopen(_url(srv, "/info"), timeout=30) as r:
            assert json.loads(r.read())["kind"] == "v2"

        # a failed reload keeps serving the previous model
        req = urllib.request.Request(
            _url(srv, "/reload"),
            data=json.dumps({"model_dir": "broken"}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 500
        assert "still serving" in json.loads(exc.value.read())["error"]
        with _post(srv, body, "application/json") as r:
            assert json.loads(r.read())["accept"] == [False]
    finally:
        srv.stop()

    srv2 = ScoringServer(Const(True), info={}).start()
    try:
        req = urllib.request.Request(_url(srv2, "/reload"), data=b"")
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 501
    finally:
        srv2.stop()


def test_reload_cli_reload_fn_systemexit_returns_500(tmp_path, data):
    """A reload through the CLI-built reload_fn pointing at a NON-model
    dir raises SystemExit (a BaseException) inside the handler; the
    server must translate it to the documented 500 and keep serving the
    previous model instead of resetting the connection (round-4 advisor
    finding)."""
    from ocm_tpu import cli
    from ocm_tpu.models.simca import fit_simca

    x_tr, y_tr, _, _ = data
    run_dir = str(tmp_path / "run")
    os.makedirs(run_dir)
    model = fit_simca(jnp.asarray(x_tr[y_tr == 0]), 3)
    cli._save_simca_model(run_dir, model,
                          {"kind": "simca", "stacked": False,
                           "class_labels": [0], "decision_type": "alt",
                           "n_components": 3})

    def reload_fn(model_dir):
        # exactly cmd_serve's shape: _build_scorer raises SystemExit on
        # a dir that is not a model run dir
        sc, inf = cli._build_scorer(model_dir or run_dir, 256, None, "d2")
        return sc, inf, inf.get("input_length")

    scorer, info = cli._build_scorer(run_dir, 256, None, "d2")
    srv = ScoringServer(scorer, info,
                        expected_length=info.get("input_length"),
                        reload_fn=reload_fn).start()
    body = json.dumps({"x": np.asarray(x_tr[:2]).tolist()}).encode()
    try:
        req = urllib.request.Request(
            _url(srv, "/reload"),
            data=json.dumps({"model_dir": str(tmp_path / "nope")}).encode(),
            headers={"Content-Type": "application/json"})
        with pytest.raises(urllib.error.HTTPError) as exc:
            urllib.request.urlopen(req, timeout=60)
        assert exc.value.code == 500
        assert "still serving" in json.loads(exc.value.read())["error"]
        # the old scorer still answers
        with _post(srv, body, "application/json") as r:
            assert r.status == 200
    finally:
        srv.stop()
