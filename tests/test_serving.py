"""Serving-layer tests: service semantics + live HTTP contract
(the automated version of the reference's manual smoke script,
``app/test_api.py`` — which required a hand-started server)."""

import json
import threading
import urllib.request

import numpy as np
import pytest

from recsys_tpu.serve.app import Api, make_http_server
from recsys_tpu.serve.service import RecommendationService, StubRecommendationService


@pytest.fixture(scope="module")
def trained_service(tmp_path_factory):
    """Train a tiny model in seconds, load it back through the full
    artifact path (SURVEY §4 'API tests via a tiny trained-in-seconds
    model')."""
    import tests.conftest  # noqa: F401  (env already set)
    from recsys_tpu.config import EvalConfig, ModelConfig, RecsysConfig, TrainConfig
    from recsys_tpu.train.trainer import Trainer

    out = str(tmp_path_factory.mktemp("serve_model"))
    # borrow the session fixtures through a local build
    from tests.conftest import tiny_raw as _  # noqa: F401
    # build a minimal bundle inline
    from recsys_tpu.data.movielens import synthesize_ratings
    from recsys_tpu.data.preprocessing import preprocessing_pipeline
    import pandas as pd

    rng = np.random.default_rng(3)
    user_ids = np.arange(1, 51)
    movie_ids = np.arange(1, 81) * 3
    genres = np.array(["Drama", "Action"] * 40)
    ratings = synthesize_ratings(user_ids, movie_ids, genres, n_ratings=1500, seed=5)
    movies = pd.DataFrame({"movie_id": movie_ids,
                           "title": [f"M ({1990})" for _ in movie_ids],
                           "genres": genres})
    users = pd.DataFrame({"user_id": user_ids, "gender": ["M", "F"] * 25,
                          "age": [25] * 50, "occupation": [1] * 50,
                          "zip": ["0"] * 50})
    bundle = preprocessing_pipeline(ratings, movies, users)
    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=8, user_tower_dims=(16,),
                          item_tower_dims=(16,), cross_layers=1, dnn_dims=(8,),
                          dropout_rate=0.0, mixed_precision=False),
        train=TrainConfig(batch_size=128, epochs=1, log_every_steps=1),
        eval=EvalConfig(topk=(5,), eval_batch_size=128),
    )
    Trainer(cfg, output_dir=out).train(bundle)
    svc = RecommendationService(f"{out}/serving").load()
    return svc, bundle


def test_service_recommend_and_score(trained_service):
    svc, bundle = trained_service
    raw_users = bundle["meta/user_raw_ids"]
    raw_items = bundle["meta/movie_raw_ids"]
    recs = svc.recommend(int(raw_users[0]), k=5)
    assert len(recs) == 5
    assert [r["rank"] for r in recs] == [1, 2, 3, 4, 5]
    # scores descending
    s = [r["score"] for r in recs]
    assert s == sorted(s, reverse=True)
    # recommended ids are real catalog raw ids
    assert all(r["item_id"] in set(raw_items.tolist()) for r in recs)

    # cold start: unknown user -> popularity fallback with fabricated scores
    cold = svc.recommend(99999, k=3)
    assert len(cold) == 3 and cold[0]["score"] == 1.0

    scores = svc.score(int(raw_users[0]), [int(raw_items[0]), int(raw_items[1])])
    assert len(scores) == 2
    with pytest.raises(ValueError):
        svc.score(99999, [int(raw_items[0])])
    with pytest.raises(ValueError):
        svc.score(int(raw_users[0]), [123456])


def test_service_batch(trained_service):
    svc, bundle = trained_service
    raw_users = bundle["meta/user_raw_ids"]
    res = svc.recommend_batch([int(raw_users[0]), 99999, int(raw_users[1])], k=4)
    assert len(res) == 3
    assert res[0]["status"] == "ok" and res[1]["status"] == "cold_start"
    assert len(res[0]["recommendations"]) == 4


def test_stub_service():
    svc = StubRecommendationService(n_users=10, n_items=20, dim=8)
    recs = svc.recommend(1, k=5)
    assert len(recs) == 5
    # deterministic across instances (seeded)
    svc2 = StubRecommendationService(n_users=10, n_items=20, dim=8)
    assert svc2.recommend(1, k=5) == recs
    info = svc.get_model_info()
    assert info["ready"] is True


# ---- HTTP contract ----------------------------------------------------

def _req(port, method, path, body=None):
    url = f"http://127.0.0.1:{port}{path}"
    data = json.dumps(body).encode() if body is not None else None
    req = urllib.request.Request(url, data=data, method=method,
                                 headers={"Content-Type": "application/json"})
    try:
        with urllib.request.urlopen(req) as r:
            return r.status, json.loads(r.read())
    except urllib.error.HTTPError as e:
        return e.code, json.loads(e.read())


@pytest.fixture(scope="module")
def live_server(trained_service):
    svc, bundle = trained_service
    server = make_http_server(svc, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    yield port, bundle
    server.shutdown()


def test_http_endpoints(live_server):
    port, bundle = live_server
    uid = int(bundle["meta/user_raw_ids"][0])
    iid = int(bundle["meta/movie_raw_ids"][0])

    code, body = _req(port, "GET", "/health")
    assert code == 200 and body["status"] == "healthy" and body["model_loaded"]

    code, body = _req(port, "GET", "/")
    assert code == 200 and "endpoints" in body

    code, body = _req(port, "GET", "/model/info")
    assert code == 200 and body["n_users"] > 0

    code, body = _req(port, "POST", "/recommend", {"user_id": uid, "k": 5})
    assert code == 200 and body["count"] == 5 and body["user_id"] == uid

    code, body = _req(port, "POST", "/recommend/batch",
                      {"user_ids": [uid, 99999], "k": 3})
    assert code == 200 and body["count"] == 2

    code, body = _req(port, "POST", "/score",
                      {"user_id": uid, "item_ids": [iid]})
    assert code == 200 and len(body["scores"]) == 1

    # 404 contract: unknown user on /score
    code, body = _req(port, "POST", "/score",
                      {"user_id": 123456, "item_ids": [iid]})
    assert code == 404

    # 422 contract: invalid k
    code, body = _req(port, "POST", "/recommend", {"user_id": uid, "k": 0})
    assert code == 422
    code, body = _req(port, "POST", "/recommend", {"user_id": uid, "k": 101})
    assert code == 422

    # unknown path
    code, _ = _req(port, "GET", "/nope")
    assert code == 404


def test_http_not_ready_503():
    server = make_http_server(None, host="127.0.0.1", port=0)
    port = server.server_address[1]
    t = threading.Thread(target=server.serve_forever, daemon=True)
    t.start()
    try:
        code, body = _req(port, "GET", "/health")
        assert code == 200 and body["status"] == "degraded"
        code, _ = _req(port, "POST", "/recommend", {"user_id": 1, "k": 5})
        assert code == 503
        code, _ = _req(port, "GET", "/model/info")
        assert code == 503
    finally:
        server.shutdown()


def test_multiworker_serving_subprocess(tmp_path):
    """--workers N forks SO_REUSEPORT processes; requests round-robin
    across them and SIGTERM reaps the whole tree (serve/app.py
    serve_forever)."""
    import os
    import signal
    import socket
    import subprocess
    import sys as _sys
    import time

    with socket.socket() as s:
        s.bind(("127.0.0.1", 0))
        port = s.getsockname()[1]

    repo = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))
    proc = subprocess.Popen(
        [_sys.executable, os.path.join(repo, "scripts", "serve.py"),
         "--stub", "--port", str(port), "--workers", "2"],
        stdout=subprocess.DEVNULL, stderr=subprocess.DEVNULL,
        start_new_session=True,
        env={**os.environ, "JAX_PLATFORMS": "cpu"},
    )
    try:
        deadline = time.time() + 60
        code = None
        while time.time() < deadline:
            try:
                code, body = _req(port, "GET", "/health")
                break
            except OSError:
                time.sleep(0.5)
        assert code == 200, "multi-worker server never became healthy"
        for _ in range(4):  # hits land on both workers via reuseport
            code, body = _req(port, "POST", "/recommend",
                              {"user_id": 1, "k": 3})
            assert code == 200 and body["count"] == 3
    finally:
        os.killpg(proc.pid, signal.SIGTERM)
        assert proc.wait(timeout=30) is not None


def test_two_stage_rerank_serving(trained_service):
    """rerank_candidates > 0 + model.npz: the service retrieves C
    candidates and reranks with the DCN CTR head; top-k stays a subset
    of the retrieval candidates and the response contract is intact."""
    svc_plain, bundle = trained_service
    d = svc_plain.model_dir
    from recsys_tpu.serve.service import RecommendationService

    svc = RecommendationService(d, rerank_candidates=20).load()
    assert svc._rerank_active(), "model.npz missing from trained bundle?"
    uid = int(bundle["meta/user_raw_ids"][0])

    plain = svc_plain.recommend(uid, 5)
    rer = svc.recommend(uid, 5)
    assert len(rer) == 5
    assert [r["rank"] for r in rer] == [1, 2, 3, 4, 5]
    # reranked top-5 must come from the retrieval top-20 candidate set
    cand_scores, cand_ids = svc_plain._search(
        svc_plain._user_embedding(svc_plain.user_id_map[uid]), 20)
    cand_raw = {int(svc_plain.index.item_raw_ids[i]) for i in cand_ids[0]}
    assert all(r["item_id"] in cand_raw for r in rer)
    # batch path agrees with single path
    batch = svc.recommend_batch([uid], 5)
    assert [r["item_id"] for r in batch[0]["recommendations"]] == [
        r["item_id"] for r in rer
    ]


def test_numpy_ctr_forward_parity(trained_service):
    """The host rerank path's NumPy towers->DCN->ctr-head forward must
    match MultiTaskModel.apply (inference mode)."""
    import jax.numpy as jnp
    from recsys_tpu.models.multitask import MultiTaskModel
    from recsys_tpu.serve.service import RecommendationService

    svc_plain, bundle = trained_service
    svc = RecommendationService(svc_plain.model_dir,
                                rerank_candidates=10).load()
    rng = np.random.default_rng(0)
    n_u = len(svc.user_id_map)
    n_i = len(svc.item_id_map)
    uids = rng.integers(0, n_u, 32).astype(np.int32)
    iids = rng.integers(0, n_i, 32).astype(np.int32)
    got = svc._ctr_logits_np(uids, iids)
    want = np.asarray(
        MultiTaskModel.apply(
            svc.model_params, svc.config.model,
            jnp.asarray(uids), jnp.asarray(iids),
        ).ctr_logit
    )
    np.testing.assert_allclose(got, want, rtol=2e-4, atol=2e-5)


def test_dense_feature_rerank_serving(tmp_path_factory):
    """A dense-features model serves two-stage rerank: features.npz
    ships in the bundle, the NumPy host path matches the jitted path,
    and recommendations come from the candidate set."""
    import pandas as pd
    import jax.numpy as jnp
    from recsys_tpu.config import EvalConfig, ModelConfig, RecsysConfig, TrainConfig
    from recsys_tpu.data.features import FeatureEngineer
    from recsys_tpu.data.movielens import synthesize_ratings
    from recsys_tpu.data.preprocessing import preprocessing_pipeline
    from recsys_tpu.models.multitask import MultiTaskModel
    from recsys_tpu.serve.service import RecommendationService
    from recsys_tpu.train.trainer import Trainer

    out = str(tmp_path_factory.mktemp("dense_serve"))
    user_ids = np.arange(1, 41)
    movie_ids = np.arange(1, 61) * 2
    genres = np.array(["Drama", "Action", "Comedy"] * 20)
    ratings = synthesize_ratings(user_ids, movie_ids, genres,
                                 n_ratings=1200, seed=9)
    movies = pd.DataFrame({"movie_id": movie_ids,
                           "title": ["M (1991)"] * len(movie_ids),
                           "genres": genres})
    users = pd.DataFrame({"user_id": user_ids, "gender": ["F", "M"] * 20,
                          "age": [35] * 40, "occupation": [2] * 40,
                          "zip": ["1"] * 40})
    bundle = preprocessing_pipeline(ratings, movies, users)
    cfg = RecsysConfig(
        model=ModelConfig(embedding_dim=8, user_tower_dims=(16,),
                          item_tower_dims=(16,), cross_layers=1,
                          dnn_dims=(8,), dropout_rate=0.0,
                          mixed_precision=False,
                          dense_features=FeatureEngineer.n_features()),
        train=TrainConfig(batch_size=128, epochs=1, log_every_steps=1),
        eval=EvalConfig(topk=(5,), eval_batch_size=128),
    )
    Trainer(cfg, output_dir=out).train(bundle)

    svc = RecommendationService(f"{out}/serving", backend="native",
                                rerank_candidates=15).load()
    assert svc._rerank_active()
    assert svc.feature_engineer is not None
    uid = int(next(iter(svc.user_id_map)))
    recs = svc.recommend(uid, k=5)
    assert len(recs) == 5
    # reranked top-5 is a subset of the retrieval top-15
    svc_plain = RecommendationService(f"{out}/serving",
                                      backend="native").load()
    cand = {r["item_id"] for r in svc_plain.recommend(uid, k=15)}
    assert all(r["item_id"] in cand for r in recs)

    # NumPy rerank path == jitted rerank path (same dense features)
    svc_dev = RecommendationService(f"{out}/serving", backend="device",
                                    rerank_candidates=15).load()
    recs_dev = svc_dev.recommend(uid, k=5)
    assert [r["item_id"] for r in recs_dev] == [r["item_id"] for r in recs]
    for a, b in zip(recs, recs_dev):
        np.testing.assert_allclose(a["score"], b["score"], rtol=2e-3, atol=2e-4)


# ---- dynamic micro-batching -------------------------------------------

def test_microbatcher_matches_direct_recommend(trained_service):
    """Concurrent requests through the batcher return exactly what a
    direct service.recommend would, including mixed per-request k and
    the cold-start fallback."""
    from recsys_tpu.serve.batcher import MicroBatcher

    svc, bundle = trained_service
    raw_users = [int(u) for u in bundle["meta/user_raw_ids"][:12]]
    jobs = [(u, 3 + (i % 4)) for i, u in enumerate(raw_users)]
    jobs.append((99999, 5))  # cold start
    expected = {(u, k): svc.recommend(u, k) for u, k in jobs}

    with MicroBatcher(svc, max_batch=8, max_wait_ms=5.0) as mb:
        results = {}
        lock = threading.Lock()

        def worker(u, k):
            r = mb.recommend(u, k)
            with lock:
                results[(u, k)] = r

        threads = [threading.Thread(target=worker, args=j) for j in jobs]
        [t.start() for t in threads]
        [t.join() for t in threads]
        stats = mb.stats()

    assert stats["n_requests"] == len(jobs)
    for key, recs in results.items():
        assert len(recs) == key[1]
        assert [r["item_id"] for r in recs] == \
            [r["item_id"] for r in expected[key]]


def test_microbatcher_actually_batches():
    """Under concurrent load with a slow backend, requests coalesce:
    far fewer recommend_batch calls than requests."""
    import time as _time

    from recsys_tpu.serve.batcher import MicroBatcher

    svc = StubRecommendationService(n_users=100, n_items=50, dim=8)
    calls = {"n": 0}
    orig = svc.recommend_batch

    def slow_batch(user_ids, k):
        calls["n"] += 1
        _time.sleep(0.02)  # hold the dispatcher so the queue builds up
        return orig(user_ids, k)

    svc.recommend_batch = slow_batch
    n = 32
    with MicroBatcher(svc, max_batch=64) as mb:
        threads = [
            threading.Thread(target=mb.recommend, args=(i % 50 + 1, 5))
            for i in range(n)
        ]
        [t.start() for t in threads]
        [t.join() for t in threads]
        stats = mb.stats()
    assert stats["n_requests"] == n
    assert calls["n"] < n / 2, f"no coalescing: {calls['n']} calls for {n} reqs"
    assert stats["max_batch_seen"] > 1


def test_microbatcher_error_and_stop():
    from recsys_tpu.serve.batcher import MicroBatcher

    svc = StubRecommendationService(n_users=10, n_items=20, dim=8)

    def boom(user_ids, k):
        raise RuntimeError("backend exploded")

    svc.recommend_batch = boom
    mb = MicroBatcher(svc).start()
    with pytest.raises(RuntimeError, match="backend exploded"):
        mb.recommend(1, 5)
    mb.stop()
    with pytest.raises(RuntimeError, match="not started"):
        mb.recommend(1, 5)


def test_http_recommend_via_microbatcher(trained_service):
    """HTTP /recommend routed through the batcher keeps the exact
    response contract."""
    from recsys_tpu.serve.batcher import MicroBatcher

    svc, bundle = trained_service
    uid = int(bundle["meta/user_raw_ids"][0])
    with MicroBatcher(svc, max_batch=32) as mb:
        server = make_http_server(svc, host="127.0.0.1", port=0, batcher=mb)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        try:
            code, body = _req(port, "POST", "/recommend",
                              {"user_id": uid, "k": 5})
            assert code == 200 and body["count"] == 5
            assert [r["rank"] for r in body["recommendations"]] == \
                [1, 2, 3, 4, 5]
            direct = svc.recommend(uid, 5)
            assert [r["item_id"] for r in body["recommendations"]] == \
                [r["item_id"] for r in direct]
            # validation errors still 422 (never reach the batcher)
            code, _ = _req(port, "POST", "/recommend",
                           {"user_id": uid, "k": 0})
            assert code == 422
        finally:
            server.shutdown()


def test_sharded_backend_serving(trained_service, tmp_path):
    """backend="sharded": the catalog served row-sharded over an
    8-device mesh gives the same recommendations as the single-device
    backend."""
    from recsys_tpu.parallel.mesh import make_mesh

    svc, bundle = trained_service
    ctx = make_mesh(model_parallel=4, data_parallel=2)
    sh_svc = RecommendationService(
        svc.model_dir, backend="sharded", mesh_ctx=ctx
    ).load()
    for uid in [int(u) for u in bundle["meta/user_raw_ids"][:4]]:
        a = svc.recommend(uid, k=7)
        b = sh_svc.recommend(uid, k=7)
        assert [r["item_id"] for r in a] == [r["item_id"] for r in b]
        assert np.allclose([r["score"] for r in a],
                           [r["score"] for r in b], atol=1e-5)
    # batch path + cold start through the sharded searcher
    uids = [int(u) for u in bundle["meta/user_raw_ids"][:3]] + [99999]
    rows = sh_svc.recommend_batch(uids, k=5)
    assert rows[-1]["status"] == "cold_start"
    assert all(len(r["recommendations"]) == 5 for r in rows)


# ---- AOT export (jax.export) ------------------------------------------

def test_aot_export_roundtrip(trained_service, tmp_path):
    """Export the retrieve path to a serialized StableHLO artifact and
    run it back: results must match the live index search, across
    different (symbolic) batch sizes."""
    import jax.numpy as jnp

    from recsys_tpu.retrieval.scorer import topk_scores
    from recsys_tpu.serve.export import export_retrieve, load_exported
    from recsys_tpu.models.towers import TwoTower

    svc, bundle = trained_service
    path = str(tmp_path / "retrieve.hlo")
    meta = export_retrieve(svc.model_dir, path, k=5)
    assert meta["bytes"] > 0 and (tmp_path / "retrieve.hlo.json").exists()

    fn = load_exported(path)
    for batch in (1, 3, 8):  # symbolic batch dim: one artifact, any B
        ids = np.arange(batch, dtype=np.int32)
        s, i = fn(ids)
        assert s.shape == (batch, 5) and i.shape == (batch, 5)
        u = TwoTower.user_embed(svc.encoder_params, jnp.asarray(ids),
                                svc.config.model)
        s_ref, i_ref = topk_scores(u, svc.index.item_embeddings, 5,
                                   svc.index.normalize)
        assert np.allclose(s, np.asarray(s_ref), atol=1e-5)
        assert (i == np.asarray(i_ref)).all()


def test_exported_backend_serving(trained_service, tmp_path):
    """backend="exported": the service answers straight from the AOT
    StableHLO artifact — results identical to the device backend."""
    from recsys_tpu.serve.export import export_retrieve
    from recsys_tpu.serve.service import RecommendationService

    svc, bundle = trained_service
    path = str(tmp_path / "retrieve.hlo")
    export_retrieve(svc.model_dir, path, k=8)
    exp = RecommendationService(
        svc.model_dir, backend="exported", exported_path=path
    ).load()
    for uid in [int(u) for u in bundle["meta/user_raw_ids"][:4]]:
        a = svc.recommend(uid, k=5)
        b = exp.recommend(uid, k=5)
        assert [r["item_id"] for r in a] == [r["item_id"] for r in b]
        assert np.allclose([r["score"] for r in a],
                           [r["score"] for r in b], atol=1e-5)
    # batch + cold start flow through the artifact too
    uids = [int(u) for u in bundle["meta/user_raw_ids"][:3]] + [99999]
    rows = exp.recommend_batch(uids, k=8)
    assert rows[-1]["status"] == "cold_start"
    assert all(len(r["recommendations"]) == 8 for r in rows)
    # k is fixed at export time: asking past it is an explicit error
    with pytest.raises(ValueError, match="exported top-k"):
        exp.recommend(uids[0], k=9)
    # ... and so is a rerank depth the artifact can't supply
    with pytest.raises(ValueError, match="exported top-k"):
        RecommendationService(svc.model_dir, backend="exported",
                              exported_path=path,
                              rerank_candidates=50).load()
    assert "exported" in exp.get_model_info()["backend"]


def test_exported_backend_rejects_stale_artifact(trained_service, tmp_path):
    """An artifact exported from an older bundle must be refused when
    the bundle is retrained/rebuilt (the artifact bakes in the old
    weights + catalog; serving it against the new index.npz/model.npz
    silently returns stale — or wrongly-mapped — results)."""
    import os

    from recsys_tpu.serve.export import export_retrieve
    from recsys_tpu.serve.service import RecommendationService

    svc, bundle = trained_service
    path = str(tmp_path / "retrieve.hlo")
    export_retrieve(svc.model_dir, path, k=5)
    # simulate a retrain: perturb the bundle's encoder weights on disk
    enc_path = os.path.join(svc.model_dir, "encoder.npz")
    with open(enc_path, "rb") as f:
        original_bytes = f.read()
    enc = dict(np.load(enc_path, allow_pickle=False))
    first = sorted(enc)[0]
    enc[first] = enc[first] + 1e-3
    np.savez(enc_path, **enc)
    try:
        with pytest.raises(ValueError, match="different bundle"):
            RecommendationService(
                svc.model_dir, backend="exported", exported_path=path
            ).load()
    finally:
        with open(enc_path, "wb") as f:
            f.write(original_bytes)
    # restored bundle loads again
    RecommendationService(
        svc.model_dir, backend="exported", exported_path=path
    ).load()


def test_export_cli(trained_service, tmp_path):
    from scripts.export import main as export_main

    svc, _ = trained_service
    out = str(tmp_path / "r.hlo")
    assert export_main(["--model_dir", svc.model_dir,
                        "--output", out, "--k", "7"]) == 0
    import os
    assert os.path.getsize(out) > 0


def test_metrics_endpoint(live_server):
    """GET /metrics: Prometheus text exposition with request counters
    and latency histograms for the endpoints hit so far."""
    port, bundle = live_server
    uid = int(bundle["meta/user_raw_ids"][0])
    _req(port, "POST", "/recommend", {"user_id": uid, "k": 2})
    _req(port, "GET", "/health")

    req = urllib.request.Request(f"http://127.0.0.1:{port}/metrics")
    with urllib.request.urlopen(req) as r:
        assert r.status == 200
        assert r.headers["Content-Type"].startswith("text/plain")
        text = r.read().decode()
    assert 'recsys_requests_total{path="/recommend",code="200"}' in text
    assert 'recsys_request_latency_seconds_bucket{path="/recommend"' in text
    assert 'le="+Inf"' in text
    # counts are cumulative and parseable
    for line in text.splitlines():
        if line.startswith("recsys_requests_total"):
            assert float(line.rsplit(" ", 1)[1]) >= 1


def test_int8_catalog_serving(trained_service):
    """int8_catalog=True on the device and sharded backends returns the
    same recommendations as the f32 service (refined device path is
    exact; sharded int8 is near-exact on trained embeddings)."""
    from recsys_tpu.parallel.mesh import make_mesh

    svc, bundle = trained_service
    uids = [int(u) for u in bundle["meta/user_raw_ids"][:4]]

    dev8 = RecommendationService(
        svc.model_dir, backend="device", int8_catalog=True
    ).load()
    ctx = make_mesh(model_parallel=4, data_parallel=2)
    sh8 = RecommendationService(
        svc.model_dir, backend="sharded", mesh_ctx=ctx, int8_catalog=True
    ).load()
    for uid in uids:
        ref = [r["item_id"] for r in svc.recommend(uid, k=5)]
        got_dev = [r["item_id"] for r in dev8.recommend(uid, k=5)]
        got_sh = [r["item_id"] for r in sh8.recommend(uid, k=5)]
        assert got_dev == ref  # refine_factor=4 makes the device path exact
        assert len(set(got_sh) & set(ref)) >= 4  # raw int8: near-exact


def test_admin_hot_reload(trained_service):
    """POST /admin/reload atomically swaps in a retrained bundle with
    zero downtime: requests before/during/after the reload all succeed,
    the swap changes live results (the bundle on disk was perturbed),
    and /model/info reflects the new bundle. Disabled (404) without a
    service factory."""
    import os
    import threading as _threading

    from recsys_tpu.serve.app import make_http_server
    from recsys_tpu.serve.service import RecommendationService

    svc, bundle = trained_service
    model_dir = svc.model_dir

    # server WITHOUT reload enabled: endpoint is 404
    srv0 = make_http_server(svc, host="127.0.0.1", port=0)
    port0 = srv0.server_address[1]
    t0 = _threading.Thread(target=srv0.serve_forever, daemon=True)
    t0.start()
    code, _ = _req(port0, "POST", "/admin/reload", {})
    assert code == 404
    srv0.shutdown()

    def factory():
        return RecommendationService(model_dir, backend="native").load()

    srv = make_http_server(factory(), host="127.0.0.1", port=0,
                           service_factory=factory)
    port = srv.server_address[1]
    t = _threading.Thread(target=srv.serve_forever, daemon=True)
    t.start()
    try:
        uid = int(bundle["meta/user_raw_ids"][0])
        code, before = _req(port, "POST", "/recommend",
                            {"user_id": uid, "k": 5})
        assert code == 200
        code, info_before = _req(port, "GET", "/model/info")
        assert code == 200

        # simulate a retrain: flip the sign of the catalog embeddings on
        # disk (reverses every ranking), preserving the artifact schema
        idx_path = os.path.join(model_dir, "index.npz")
        original = open(idx_path, "rb").read()
        idx = dict(np.load(idx_path, allow_pickle=False))
        emb_key = [k for k in idx if "emb" in k][0]
        idx[emb_key] = -idx[emb_key]
        np.savez(idx_path, **idx)
        try:
            code, rep = _req(port, "POST", "/admin/reload", {})
            assert code == 200 and rep["reloaded"] and rep["reload_count"] == 1
            code, after = _req(port, "POST", "/recommend",
                               {"user_id": uid, "k": 5})
            assert code == 200
            ids_before = [r["item_id"] for r in before["recommendations"]]
            ids_after = [r["item_id"] for r in after["recommendations"]]
            assert ids_before != ids_after, "reload did not change results"
            code, _ = _req(port, "GET", "/health")
            assert code == 200
        finally:
            open(idx_path, "wb").write(original)

        # reload back to the restored bundle: original results return
        code, rep = _req(port, "POST", "/admin/reload", {})
        assert code == 200 and rep["reload_count"] == 2
        code, again = _req(port, "POST", "/recommend",
                           {"user_id": uid, "k": 5})
        assert [r["item_id"] for r in again["recommendations"]] == [
            r["item_id"] for r in before["recommendations"]]
    finally:
        srv.shutdown()


def test_admin_hot_reload_with_microbatcher(trained_service):
    """Reload swaps the micro-batcher too: a fresh dispatcher is started
    on the new service and the old one is drained/stopped."""
    import threading as _threading

    from recsys_tpu.serve.app import make_http_server
    from recsys_tpu.serve.batcher import MicroBatcher
    from recsys_tpu.serve.service import RecommendationService

    svc, bundle = trained_service
    model_dir = svc.model_dir

    def factory():
        return RecommendationService(model_dir, backend="native").load()

    first = factory()
    batcher = MicroBatcher(first, max_batch=32).start()
    srv = make_http_server(first, host="127.0.0.1", port=0,
                           batcher=batcher, service_factory=factory)
    port = srv.server_address[1]
    _threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        uid = int(bundle["meta/user_raw_ids"][1])
        code, _ = _req(port, "POST", "/recommend", {"user_id": uid, "k": 3})
        assert code == 200
        code, rep = _req(port, "POST", "/admin/reload", {})
        assert code == 200
        # old dispatcher stopped, a new one is live and serving
        assert not batcher._running
        code, body = _req(port, "POST", "/recommend", {"user_id": uid, "k": 3})
        assert code == 200 and len(body["recommendations"]) == 3
    finally:
        srv.shutdown()


def test_admin_reload_recovers_degraded_server(trained_service, tmp_path):
    """A server that started in degraded mode (bundle missing at
    startup) recovers via /admin/reload once the bundle exists —
    restart-free recovery from the reference's 503 degraded state."""
    import shutil
    import threading as _threading

    from recsys_tpu.serve.app import make_http_server
    from recsys_tpu.serve.service import RecommendationService

    svc, bundle = trained_service
    staged = str(tmp_path / "late_bundle")

    def factory():
        return RecommendationService(staged, backend="native").load()

    # bundle dir doesn't exist yet -> degraded startup (503s)
    srv = make_http_server(None, host="127.0.0.1", port=0,
                           service_factory=factory)
    port = srv.server_address[1]
    _threading.Thread(target=srv.serve_forever, daemon=True).start()
    try:
        uid = int(bundle["meta/user_raw_ids"][0])
        code, _ = _req(port, "POST", "/recommend", {"user_id": uid, "k": 3})
        assert code == 503
        code, _ = _req(port, "POST", "/admin/reload", {})
        assert code == 500  # bundle still missing: old (empty) state stays

        shutil.copytree(svc.model_dir, staged)
        code, rep = _req(port, "POST", "/admin/reload", {})
        assert code == 200 and rep["model_info"]["ready"]
        code, body = _req(port, "POST", "/recommend", {"user_id": uid, "k": 3})
        assert code == 200 and len(body["recommendations"]) == 3
        code, body = _req(port, "GET", "/health")
        assert code == 200 and body["model_loaded"]
    finally:
        srv.shutdown()


def test_fast_rerank_matches_exact_logits(trained_service):
    """The precomputed rerank (_FastRerank: materialized towers,
    separable cross, additive feature split) must reproduce the exact
    per-pair CTR logits on a dense random sample — beyond the 64-pair
    self-check that gates its activation at load."""
    svc, _ = trained_service
    d = svc.model_dir
    rr = RecommendationService(d, backend="native",
                               rerank_candidates=20).load()
    assert rr._rerank_active()
    assert rr._fast_rerank is not None and rr._fast_rerank.ok
    rng = np.random.default_rng(7)
    n_u, n_i = len(rr.user_id_map), len(rr.item_id_map)
    uids = rng.integers(0, n_u, 40)
    cands = rng.integers(0, n_i, (40, 12))
    fast = rr._fast_rerank.ctr_logits(uids, cands)
    exact = rr._ctr_exact_for_check(
        np.repeat(uids, 12), cands.reshape(-1)).reshape(40, 12)
    np.testing.assert_allclose(fast, exact, rtol=1e-4, atol=1e-5)


def test_fast_rerank_self_check_refuses_mismatch(trained_service):
    """If the exact path disagrees (e.g. a future non-separable feature
    column), build() must return None so serving falls back to the
    exact per-pair path instead of silently skewing results."""
    from recsys_tpu.serve.service import _FastRerank

    svc, _ = trained_service
    rr = RecommendationService(svc.model_dir, backend="native",
                               rerank_candidates=20).load()
    bad = _FastRerank.build(
        rr.model_params, rr.config.model, rr.feature_engineer,
        len(rr.user_id_map), len(rr.item_id_map), rr._tower_np,
        lambda u, i: np.full(len(u), 1e6, np.float32),  # "exact" disagrees
    )
    assert bad is None


def test_fast_rerank_rating_head_matches_exact(trained_service):
    """The rating head now serves (VERDICT r4 item 6,
    rerank_weight_sweep.json: +2.1% recall@10 at ctr=0.1/rating=0.25),
    so _FastRerank's separable collapse must reproduce BOTH heads'
    exact per-pair outputs, not just the CTR logit."""
    svc, _ = trained_service
    rr = RecommendationService(svc.model_dir, backend="native",
                               rerank_candidates=20,
                               rerank_rating_weight=0.25).load()
    assert rr._fast_rerank is not None and rr._fast_rerank.ok
    rng = np.random.default_rng(11)
    n_u, n_i = len(rr.user_id_map), len(rr.item_id_map)
    uids = rng.integers(0, n_u, 40)
    cands = rng.integers(0, n_i, (40, 12))
    fast_ctr, fast_rating = rr._fast_rerank.logits(uids, cands)
    exact = rr._heads_exact_for_check(
        np.repeat(uids, 12), cands.reshape(-1)).reshape(40, 12, 2)
    np.testing.assert_allclose(fast_ctr, exact[..., 0],
                               rtol=1e-4, atol=1e-5)
    np.testing.assert_allclose(fast_rating, exact[..., 1],
                               rtol=1e-4, atol=1e-5)


def test_rerank_rating_weight_wired_and_paths_agree(trained_service):
    """rerank_rating_weight must (a) actually move the combined score,
    and (b) produce identical results through the fast precomputed path
    and the exact per-pair fallback."""
    svc, _ = trained_service
    rr = RecommendationService(svc.model_dir, backend="native",
                               rerank_candidates=20,
                               rerank_ctr_weight=0.1,
                               rerank_rating_weight=0.25).load()
    rr0 = RecommendationService(svc.model_dir, backend="native",
                                rerank_candidates=20,
                                rerank_ctr_weight=0.1).load()
    rng = np.random.default_rng(4)
    n_u, n_i = len(rr.user_id_map), len(rr.item_id_map)
    uids = rng.integers(0, n_u, 8)
    cands = rng.integers(0, n_i, (8, 20))
    scores = rng.normal(size=(8, 20)).astype(np.float32)

    s_fast, i_fast = rr._rerank(uids, scores, cands, 10)
    s_ctr_only, _ = rr0._rerank(uids, scores, cands, 10)
    assert not np.allclose(s_fast, s_ctr_only)  # (a) weight is live

    rr._fast_rerank = None  # force the exact per-pair fallback
    s_exact, i_exact = rr._rerank(uids, scores, cands, 10)
    np.testing.assert_array_equal(i_fast, i_exact)  # (b) path parity
    np.testing.assert_allclose(s_fast, s_exact, rtol=1e-4, atol=1e-5)


def test_rerank_runs_through_batched_path(trained_service):
    """VERDICT r2 item 1: under the micro-batcher, concurrent rerank
    requests must coalesce into ONE batched _rerank call ([Q, C] with
    Q > 1), and results must equal direct single-user recommends."""
    import threading

    from recsys_tpu.serve.batcher import MicroBatcher

    svc, _ = trained_service
    rr = RecommendationService(svc.model_dir, backend="native",
                               rerank_candidates=20).load()
    assert rr._rerank_active()
    seen_q = []
    orig = rr._rerank

    def spy(dense_uids, scores, idx, k):
        seen_q.append(np.asarray(idx).shape[0])
        return orig(dense_uids, scores, idx, k)

    rr._rerank = spy
    uids = list(rr.user_id_map.keys())[:12]
    direct = {u: [r["item_id"] for r in rr.recommend(u, 5)] for u in uids}
    seen_q.clear()

    with MicroBatcher(rr, max_batch=64, max_wait_ms=30.0) as mb:
        results = {}
        lock = threading.Lock()

        def worker(u):
            res = mb.recommend(u, 5)
            with lock:
                results[u] = [r["item_id"] for r in res]

        threads = [threading.Thread(target=worker, args=(u,)) for u in uids]
        for t in threads:
            t.start()
        for t in threads:
            t.join()
    assert results == direct
    assert max(seen_q) > 1, (
        f"rerank never saw a multi-user batch (Q sizes: {seen_q})"
    )


def test_fastapi_adapter_contract_parity(trained_service):
    """``make_fastapi_app`` must answer the same (status, payload) as
    the stdlib transports for the shared request matrix. Runs wherever
    fastapi (+ its test client's httpx) is installed; skipped here —
    the adapter is pure delegation to the exhaustively-tested ``Api``,
    and this guard asserts the route glue in envs that can."""
    fastapi = pytest.importorskip("fastapi")  # noqa: F841
    testclient = pytest.importorskip("fastapi.testclient")

    from recsys_tpu.serve.app import Api, make_fastapi_app

    svc, bundle = trained_service
    app = make_fastapi_app(svc)
    client = testclient.TestClient(app)
    api = Api(svc)
    uid = int(bundle["meta/user_raw_ids"][0])
    item = int(bundle["meta/movie_raw_ids"][0])
    matrix = [
        ("GET", "/", None),
        ("GET", "/health", None),
        ("GET", "/model/info", None),
        ("POST", "/recommend", {"user_id": uid, "k": 3}),
        ("POST", "/recommend", {"user_id": -5, "k": 3}),
        ("POST", "/recommend", {"user_id": uid, "k": 0}),
        ("POST", "/recommend/batch", {"user_ids": [uid], "k": 2}),
        ("POST", "/score", {"user_id": uid, "item_id": item}),
    ]
    for method, path, body in matrix:
        want_code, want_payload = (
            api.dispatch(method, path, body) if method == "POST"
            else api.dispatch("GET", path, None))
        r = (client.post(path, json=body) if method == "POST"
             else client.get(path))
        assert r.status_code == want_code, (path, r.status_code, want_code)
        assert r.json() == want_payload, (path, r.json())
