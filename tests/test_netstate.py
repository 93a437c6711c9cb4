"""HTTP state endpoint: RemoteStore/RemoteQueue against serve_state.

The network replacement for the reference's Kafka + MariaDB services
(docker-compose.yml:1-63): same method surface as the local sqlite
classes, exercised over a real HTTP server in-process.
"""

from __future__ import annotations

import threading

import numpy as np
import pytest

from aligner_tpu.errors import ValidationError
from aligner_tpu.service.netstate import (
    RemoteQueue,
    RemoteStore,
    is_url,
    serve_state,
)
from aligner_tpu.service.queue import open_queue
from aligner_tpu.service.store import open_store


@pytest.fixture
def endpoint(tmp_path):
    server = serve_state("127.0.0.1", 0, str(tmp_path / "state.db"))
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    yield url
    server.shutdown()


class Req:
    kd_value = 0.0
    r_squared_value = 100.0
    del_value = 7.0
    dim_value = 24
    matrices_volume_value = 2


def test_store_roundtrip_over_http(endpoint, rng):
    store = RemoteStore(endpoint)
    store.insert_align_task(Req, "h1", "qid", "HEAG", "tid", "PAWH")
    assert store.get_task_id_by_hash("h1") == 1
    assert store.get_task_id_by_hash("missing") is None
    with pytest.raises(ValidationError):
        store.insert_align_task(Req, "h1", "qid", "HEAG", "tid", "PAWH")

    m = rng.integers(-2, 3, (24, 24)).astype(np.float64)
    store.insert_align_subtask("h1", 12.5, m, "HE_AG", "PAWH_")
    store.insert_align_subtask("h1", 30.0, m * 2, "HEAG", "PAWH")
    assert store.get_percentage_by_hash("h1") == 100.0
    f, best_m, rq, rt = store.get_best_subtask_by_hash("h1")
    assert f == 30.0
    np.testing.assert_array_equal(best_m, m * 2)  # ndarray round-trip
    assert store.promote_if_complete("h1") is True
    assert store.get_all_unfinished_hashes() == ["h1"]

    # base matrices carry ndarrays both ways
    store.insert_base_matrix(24, m)
    back = store.get_base_matrices_with_limit(24, 5)
    assert len(back) == 1
    np.testing.assert_array_equal(back[0], m)


def test_queue_roundtrip_over_http(endpoint):
    queue = RemoteQueue(endpoint)
    name = queue.register_consumer("grp", "worker-x")
    assert name == "worker-x"
    queue.heartbeat(name, "grp")
    assert queue.group_members("grp") == ["worker-x"]

    queue.produce("topic", "payload-1", "grp")
    queue.produce("topic", "payload-2", "grp")
    assert queue.pending("topic", "grp") == 2
    claimed = queue.claim_batch("topic", name, "grp", limit=10)
    assert [p for _, p in claimed] == ["payload-1", "payload-2"]
    queue.commit([jid for jid, _ in claimed])
    assert queue.pending("topic", "grp") == 0


def test_worker_end_to_end_over_http(endpoint, rng, monkeypatch):
    """The actual Worker, talking exclusively to the HTTP endpoint."""
    from aligner_tpu.service.dispatcher import TOPIC_JOBS
    from aligner_tpu.service.models import AlignJob
    from aligner_tpu.service.worker import Worker

    store = RemoteStore(endpoint)
    queue = RemoteQueue(endpoint)
    qs = "".join("ARNDCQEGHILKMFPSTWYV"[c] for c in rng.integers(0, 20, 30))
    ts = "".join("ARNDCQEGHILKMFPSTWYV"[c] for c in rng.integers(0, 20, 32))
    store.insert_align_task(Req, "hw", "q", qs, "t", ts)
    freqs = np.full(24, 1.0 / 24)
    for _ in range(2):
        job = AlignJob(
            sequence_1=qs, sequence_2=ts,
            matrix=rng.integers(-1, 2, (24, 24)).astype(np.float64),
            frequences=freqs, kd_value=0.0, r_squared_value=100.0,
            del_value=7.0, matrices_volume_value=2, hash="hw",
        )
        queue.produce(TOPIC_JOBS, job.to_json())
    w = Worker(store=store, queue=queue, name="remote-worker", backend="xla")
    assert w.process_batch() == 2
    assert store.get_percentage_by_hash("hw") == 100.0
    assert store.promote_if_complete("hw") is True


def test_open_factories(tmp_path, endpoint, monkeypatch):
    assert is_url("http://x:1") and is_url("https://x") and not is_url("/a/b")
    monkeypatch.setenv("ALIGNER_DB", endpoint)
    monkeypatch.delenv("ALIGNER_QUEUE", raising=False)
    assert isinstance(open_store(), RemoteStore)
    assert isinstance(open_queue(), RemoteQueue)
    monkeypatch.setenv("ALIGNER_DB", str(tmp_path / "local.db"))
    from aligner_tpu.service.queue import JobQueue
    from aligner_tpu.service.store import Store

    assert isinstance(open_store(), Store)
    assert isinstance(open_queue(), JobQueue)


def test_unknown_method_rejected(endpoint):
    store = RemoteStore(endpoint)
    with pytest.raises(AttributeError):
        store._conn()
    # a hand-rolled call to a private method is rejected server-side
    proxy = RemoteStore(endpoint)
    with pytest.raises(ValidationError):
        proxy._call("_conn")


def test_concurrent_remote_workers_at_least_once(endpoint):
    """Two remote consumers racing the same topic: every job is claimed
    exactly once while both are live (lease-based, like the reference's
    consumer group)."""
    q1 = RemoteQueue(endpoint)
    q2 = RemoteQueue(endpoint)
    q1.register_consumer("grp", "w1")
    q2.register_consumer("grp", "w2")
    for i in range(10):
        q1.produce("race", f"job-{i}", "grp")
    got1 = q1.claim_batch("race", "w1", "grp", limit=6)
    got2 = q2.claim_batch("race", "w2", "grp", limit=6)
    ids1 = {j for j, _ in got1}
    ids2 = {j for j, _ in got2}
    assert not (ids1 & ids2)  # no double-claim while leases are live
    assert len(ids1 | ids2) == 10
    q1.commit(list(ids1))
    q2.commit(list(ids2))
    assert q1.pending("race", "grp") == 0


def test_token_gating(tmp_path, monkeypatch):
    monkeypatch.delenv("ALIGNER_STATE_TOKEN", raising=False)
    server = serve_state("127.0.0.1", 0, str(tmp_path / "tok.db"),
                         token="s3cret")
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    url = f"http://127.0.0.1:{server.server_address[1]}"
    try:
        import urllib.error

        with pytest.raises(urllib.error.HTTPError):
            # token="" = explicitly none (None falls back to the env)
            RemoteQueue(url, token="").pending("t")  # no token -> 403
        with pytest.raises(urllib.error.HTTPError):
            RemoteQueue(url, token="wrong").pending("t")
        assert RemoteQueue(url, token="s3cret").pending("t") == 0
        # clients pick the token up from the env contract too
        monkeypatch.setenv("ALIGNER_STATE_TOKEN", "s3cret")
        assert RemoteQueue(url).pending("t") == 0
    finally:
        server.shutdown()
