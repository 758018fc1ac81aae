"""Worker process for ``test_two_process_sharded_serving``: serve
``/recommend`` from a catalog row-sharded across TWO OS processes.

Every process joins the global mesh and builds the same
``backend="sharded"`` service (the catalog lives row-sharded over all
four devices; no process holds it whole when int8/rows tile it).
Multi-controller JAX requires every process to enter each computation,
so serving uses the standard driver-broadcast pattern: process 0 runs
the real HTTP server and relays each request's user id to the other
processes via ``broadcast_one_to_all``; they loop executing the same
``recommend`` (one jitted per-shard matmul + top-k + cross-shard merge
over Gloo). A sentinel uid shuts the loop down.

Usage (launched by the test with JAX_COORDINATOR_ADDRESS etc. set):
  python tests/sharded_serve_worker.py <model_dir> <out.json> <uids_json>
"""

import json
import os
import sys
import threading

import numpy as np

sys.path.insert(0, os.path.dirname(os.path.dirname(os.path.abspath(__file__))))

K = 5
SENTINEL = -2


def main() -> int:
    model_dir, out_path, uids_json = sys.argv[1:4]
    uids = json.loads(uids_json)

    from recsys_tpu.parallel.mesh import (
        make_mesh, maybe_initialize_distributed,
    )

    maybe_initialize_distributed()
    import jax
    from jax.experimental import multihost_utils

    from recsys_tpu.serve.service import RecommendationService

    ctx = make_mesh(model_parallel=len(jax.devices()), data_parallel=1)
    svc = RecommendationService(
        model_dir, backend="sharded", mesh_ctx=ctx
    ).load()

    if jax.process_index() == 0:
        from recsys_tpu.serve.app import make_http_server

        class Relay:
            """Service adapter: broadcast the uid before scoring so every
            process joins the collective search program."""

            def __init__(self, inner):
                self._inner = inner
                self._lock = threading.Lock()

            def recommend(self, user_id, k=K):
                with self._lock:
                    multihost_utils.broadcast_one_to_all(
                        np.array([int(user_id)], np.int64))
                    return self._inner.recommend(user_id, k)

            def __getattr__(self, name):
                return getattr(self._inner, name)

        server = make_http_server(Relay(svc), host="127.0.0.1", port=0)
        port = server.server_address[1]
        t = threading.Thread(target=server.serve_forever, daemon=True)
        t.start()
        import urllib.request

        results = {}
        for uid in uids:
            req = urllib.request.Request(
                f"http://127.0.0.1:{port}/recommend",
                data=json.dumps({"user_id": int(uid), "k": K}).encode(),
                headers={"Content-Type": "application/json"},
            )
            with urllib.request.urlopen(req, timeout=180) as r:
                assert r.status == 200
                results[str(uid)] = json.loads(r.read())
        multihost_utils.broadcast_one_to_all(
            np.array([SENTINEL], np.int64))
        server.shutdown()
        with open(out_path, "w") as f:
            json.dump(results, f)
    else:
        while True:
            got = multihost_utils.broadcast_one_to_all(
                np.array([0], np.int64))
            uid = int(np.asarray(got)[0])
            if uid == SENTINEL:
                break
            svc.recommend(uid, K)
    multihost_utils.sync_global_devices("sharded_serve_done")
    return 0


if __name__ == "__main__":
    sys.exit(main())
