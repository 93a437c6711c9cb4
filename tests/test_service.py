"""End-to-end service tests: validate → queue → worker → promote → p-value."""

import json
import threading
import time
import urllib.request

import numpy as np
import pytest

from aligner_tpu.service.dispatcher import (
    Dispatcher,
    GROUP,
    TOPIC_JOBS,
    generate_pairs,
    serve,
    symbol_frequencies,
)
from aligner_tpu.service.models import AlignJob, AlignJobRequest, task_hash
from aligner_tpu.service.queue import JobQueue
from aligner_tpu.service.store import Store, get_population
from aligner_tpu.service.updater import run_once as updater_run
from aligner_tpu.service.worker import Worker

FASTA = """>seq1
HEAGAWGHEE
>seq2
PAWHEAE
>seq3
HEAGAWGHEA
"""

REQ = {
    "sequences": FASTA,
    "kdValue": 0.0,
    "rSquaredValue": 100.0,
    "delValue": 5.0,
    "dimValue": 24,
    "matricesVolumeValue": 3,
}


@pytest.fixture
def svc(tmp_path):
    db = str(tmp_path / "svc.db")
    store = Store(db)
    queue = JobQueue(db)
    return Dispatcher(store, queue, rng=np.random.default_rng(0)), store, queue


def test_validate_creates_tasks_and_jobs(svc):
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    assert code == 200
    assert len(resp["hashes"]) == 3  # all pairs of 3 sequences
    assert queue.pending(TOPIC_JOBS) == 9  # 3 pairs x 3 matrices
    # duplicate submission → no new tasks
    code, resp = disp.validate(REQ)
    assert code == 500


def test_validate_errors(svc):
    disp, _, _ = svc
    code, resp = disp.validate({**REQ, "sequences": ">only_one\nAAAA\n"})
    assert code == 400
    code, resp = disp.validate({"bogus": 1})
    assert code == 400
    # non-positive dims/volumes 400 up front: dim<=0 used to crash
    # matrix generation mid-request (dropped HTTP response + orphan
    # CREATED task) and volume<=0 returned 200 for a task that spawns
    # zero jobs and can never reach 100%
    for bad in ({**REQ, "dimValue": -3}, {**REQ, "dimValue": 0},
                {**REQ, "matricesVolumeValue": 0}):
        code, resp = disp.validate(bad)
        assert code == 400, bad


def test_worker_processes_and_promotes(svc):
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    hashes = resp["hashes"]
    w = Worker(store, queue, batch=16, backend="xla")
    while queue.pending(TOPIC_JOBS) > 0:
        assert w.process_batch() > 0 or queue.pending(TOPIC_JOBS) == 0
    for h in hashes:
        assert store.get_percentage_by_hash(h) == 100.0
    # the snapshot reports 100% and promotes inline (handlers.rs:165-172);
    # promotion deletes subtasks so later ticks read 0 — as in the reference
    snap = disp.progress_snapshot(hashes)
    assert all(v == 100.0 for v in snap["progress"].values())
    assert updater_run(store) == 0  # everything already promoted inline
    # promotion stored a result with the max f among subtasks
    for h in hashes:
        tid = store.get_task_id_by_hash(h)
        row = store.get_result_matrix_by_task_id(tid)
        assert row is not None
        assert row[2] >= 0.0


def test_calc_backfills_p_values(svc):
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    w = Worker(store, queue, batch=32, backend="xla")
    while queue.pending(TOPIC_JOBS) > 0:
        w.process_batch()
    updater_run(store)
    from aligner_tpu.cli.calc import run_once

    n = run_once(store, rng=np.random.default_rng(0), backend="xla", n_sequences=60)
    assert n == 3
    # a degenerate fit can produce a NaN p-value (the reference's math does
    # too); sqlite stores NaN as NULL so such tasks stay unfilled
    assert len(store.get_ids_with_null_p_value()) <= 1


def test_queue_lease_redelivery(tmp_path):
    q = JobQueue(str(tmp_path / "q.db"))
    q.produce(TOPIC_JOBS, "payload1")
    a = q.claim_batch(TOPIC_JOBS, "c1", lease=0.0)  # expires immediately
    assert len(a) == 1
    b = q.claim_batch(TOPIC_JOBS, "c2")
    assert len(b) == 1  # redelivered
    q.commit([b[0][0]])
    assert q.pending(TOPIC_JOBS) == 0


def _health_node(health: dict, name: str) -> dict:
    nodes = [n for n in health["nodes"] if n["consumerName"] == name]
    assert len(nodes) == 1, health
    return nodes[0]


def test_health_members(svc):
    disp, store, queue = svc
    queue.register_consumer(GROUP, "node-a")
    node = _health_node(disp.health_check(), "node-a")
    assert node["status"] is True
    assert node["lastSeenAgeSec"] >= 0.0
    assert node["claimedJobs"] == 0


def test_health_reports_stale_and_load(svc, monkeypatch):
    """status reflects real liveness and claimedJobs real load, not a
    hardcoded True (handlers.rs:32-70 reports Kafka member state)."""
    import time as _time

    from aligner_tpu.service import queue as queue_mod

    disp, store, queue = svc
    queue.register_consumer(GROUP, "node-live")
    queue.produce(TOPIC_JOBS, "p1")
    queue.claim_batch(TOPIC_JOBS, "node-live", GROUP)
    node = _health_node(disp.health_check(), "node-live")
    assert node["status"] is True and node["claimedJobs"] == 1
    # age the heartbeat past the health window → stale, still listed
    real_time = _time.time
    monkeypatch.setattr(
        queue_mod.time, "time",
        lambda: real_time() + queue_mod.HEALTH_WINDOW + 5.0,
    )
    node = _health_node(disp.health_check(), "node-live")
    assert node["status"] is False
    assert node["lastSeenAgeSec"] > queue_mod.HEALTH_WINDOW


def test_claim_batch_race_no_overlap(tmp_path):
    """Two threads hammering claim_batch must never claim the same job
    (the Kafka consumer-group exclusivity property, node/main.rs:32-44)."""
    db = str(tmp_path / "race.db")
    q = JobQueue(db)
    n_jobs = 40
    for i in range(n_jobs):
        q.produce(TOPIC_JOBS, f"job-{i}")

    claims: dict[str, list[int]] = {"c1": [], "c2": []}
    errors: list[Exception] = []
    barrier = threading.Barrier(2)

    def run(consumer: str):
        local_q = JobQueue(db)  # own connection per worker, as in prod
        barrier.wait()
        try:
            while True:
                got = local_q.claim_batch(TOPIC_JOBS, consumer, GROUP, limit=4)
                if not got:
                    break
                claims[consumer].extend(j for j, _ in got)
        except Exception as e:  # pragma: no cover
            errors.append(e)

    threads = [threading.Thread(target=run, args=(c,)) for c in claims]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert not errors
    ids1, ids2 = set(claims["c1"]), set(claims["c2"])
    assert ids1 & ids2 == set(), f"double-claimed jobs: {ids1 & ids2}"
    assert len(ids1 | ids2) == n_jobs


def test_redelivery_duplicate_still_promotes(svc):
    """A lease-expiry redelivery (crash between store and commit) must
    not deadlock promotion: the keyed insert is idempotent and the gate
    is >= 100%, so the task still completes (VERDICT r2 weak #1/#2)."""
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    h = resp["hashes"][0]
    mat = np.zeros((24, 24))
    volume = REQ["matricesVolumeValue"]
    for i in range(volume):
        store.insert_align_subtask(h, float(i), mat, "Q", "T", source_key=str(i))
    # redelivered duplicates: same source keys again → no-ops
    for i in range(volume):
        store.insert_align_subtask(h, float(i), mat, "Q", "T", source_key=str(i))
    assert store.get_percentage_by_hash(h) == 100.0
    # and an unkeyed duplicate overshooting the count must still promote
    store.insert_align_subtask(h, -1.0, mat, "Q", "T")
    snap = disp.progress_snapshot([h])
    assert snap["progress"][h] == 100.0  # display is capped
    tid = store.get_task_id_by_hash(h)
    row = store.get_result_matrix_by_task_id(tid)
    assert row is not None and row[2] == float(volume - 1)  # max f promoted


def test_promote_exactly_once_concurrent(svc):
    """Concurrent promotions (two progress streams) insert exactly one
    result_matrices row."""
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    h = resp["hashes"][0]
    mat = np.zeros((24, 24))
    for i in range(REQ["matricesVolumeValue"]):
        store.insert_align_subtask(h, float(i), mat, "Q", "T", source_key=str(i))
    results = []
    barrier = threading.Barrier(4)

    def promote():
        local = Store(store.path)
        barrier.wait()
        results.append(local.promote_if_complete(h))

    threads = [threading.Thread(target=promote) for _ in range(4)]
    for t in threads:
        t.start()
    for t in threads:
        t.join(timeout=60)
    assert sum(results) == 1
    import sqlite3

    with sqlite3.connect(store.path) as conn:
        n = conn.execute(
            """select count(1) from result_matrices rm
               inner join align_tasks at2 on rm.task_id = at2.id
               where at2.hash = ?""",
            (h,),
        ).fetchone()[0]
    assert n == 1


def test_population_threshold(tmp_path, rng):
    store = Store(str(tmp_path / "p.db"))
    mats = get_population(store, 24, 5, rng)
    assert len(mats) == 5
    from aligner_tpu.matrices import get_threshold

    thr = get_threshold(24)
    for i in range(5):
        for j in range(i + 1, 5):
            assert np.linalg.norm(mats[i] - mats[j]) >= thr
    # persisted: fetching again returns the stored ones
    again = get_population(store, 24, 5, rng)
    assert all(np.array_equal(a, b) for a, b in zip(mats, again))


def test_job_roundtrip_serialization(rng):
    job = AlignJob(
        sequence_1="HEAG", sequence_2="PAWH",
        matrix=rng.random((4, 4)), frequences=rng.random(4),
        kd_value=1.0, r_squared_value=2.0, del_value=3.0,
        matrices_volume_value=4, hash="abc",
    )
    back = AlignJob.from_json(job.to_json())
    assert np.array_equal(back.matrix, job.matrix)
    assert np.array_equal(back.frequences, job.frequences)
    assert back.hash == "abc"


def test_http_server_end_to_end(svc):
    disp, store, queue = svc
    server = serve("127.0.0.1", 0, disp, sse_ticks=1)
    port = server.server_address[1]
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    try:
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/health/check"
        ) as r:
            assert json.loads(r.read())["nodes"] == []
        req = urllib.request.Request(
            f"http://127.0.0.1:{port}/validate",
            data=json.dumps(REQ).encode(),
            headers={"Content-Type": "application/json"},
        )
        with urllib.request.urlopen(req) as r:
            hashes = json.loads(r.read())["hashes"]
        assert len(hashes) == 3
        with urllib.request.urlopen(
            f"http://127.0.0.1:{port}/progress?hashes={','.join(hashes)}"
        ) as r:
            line = r.readline().decode()
            assert line.startswith("data: ")
            snap = json.loads(line[6:])
            assert set(snap["progress"].keys()) == set(hashes)
    finally:
        server.shutdown()


def test_symbol_frequencies_deterministic():
    f = symbol_frequencies("AARA", "RN", 24)
    assert f[0] == 3 / 6  # A
    assert f[1] == 2 / 6  # R
    assert f[2] == 1 / 6  # N
    assert f.sum() == pytest.approx(1.0)


def test_blast_cmp(tmp_path, rng):
    from aligner_tpu.service.blast_cmp import load_blast_results, run_cmp

    db = str(tmp_path / "b.db")
    store = Store(db)
    queue = JobQueue(db)
    disp = Dispatcher(store, queue, rng=rng)
    disp.validate(REQ)  # gives align_tasks rows to resolve identifiers from
    csvp = tmp_path / "blast.csv"
    csvp.write_text("seq1,seq2,0|005\n".replace("|", ","))
    assert load_blast_results(store, str(csvp)) == 1
    n = run_cmp(store, rng=np.random.default_rng(0), backend="xla", n_sequences=60)
    assert n == 1
    rows = store.get_cmp_table()
    assert rows[0][4] is not None and 0.0 <= rows[0][4] <= 1.0


def test_worker_drops_poison_messages(svc):
    disp, store, queue = svc
    queue.produce(TOPIC_JOBS, "{not json", GROUP)
    disp.validate(REQ)
    w = Worker(store, queue, batch=64, backend="xla")
    while queue.pending(TOPIC_JOBS) > 0:
        w.process_batch()
    assert queue.pending(TOPIC_JOBS) == 0  # poison committed away, not looping


def test_two_workers_compete(svc):
    """At-least-once with two consumers: every job handled exactly once
    here (leases prevent double-claiming live jobs)."""
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    w1 = Worker(store, queue, name="w1", batch=4, backend="xla")
    w2 = Worker(store, queue, name="w2", batch=4, backend="xla")
    while queue.pending(TOPIC_JOBS) > 0:
        w1.process_batch()
        w2.process_batch()
    for h in resp["hashes"]:
        assert store.get_percentage_by_hash(h) == 100.0
    assert _health_node(disp.health_check(), "w1")["status"] is True


def test_post_promotion_redelivery_is_noop(svc):
    """A redelivery landing AFTER promotion (promotion deleted the
    subtask rows and their source_keys) must not orphan a subtask into
    the DONE task — the percentage must stay 100."""
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    h = resp["hashes"][0]
    mat = np.zeros((24, 24))
    volume = REQ["matricesVolumeValue"]
    for i in range(volume):
        store.insert_align_subtask(h, float(i), mat, "Q", "T",
                                   source_key=str(i))
    assert store.promote_if_complete(h)
    # late redelivery of job 0 (its source_key row was deleted with the
    # other subtasks at promotion)
    store.insert_align_subtask(h, 0.0, mat, "Q", "T", source_key="0")
    assert store.get_percentage_by_hash(h) == 0.0  # no orphan rows
    tid = store.get_task_id_by_hash(h)
    assert store.get_result_matrix_by_task_id(tid) is not None
    snap = disp.progress_snapshot([h])
    assert snap["progress"][h] == 100.0  # DONE task reports complete


def test_worker_deregisters_on_clean_shutdown(svc):
    """A bounded (clean-exit) worker run removes its consumer row, so
    /health/check doesn't report a dead node for the retention hour;
    a still-registered consumer remains visible."""
    disp, store, queue = svc
    w = Worker(store, queue, name="short-lived", batch=4, backend="xla")
    lingering = queue.register_consumer("aligner.jobs.group", "crashed-one")
    w.run_forever(poll_interval=0.0, max_batches=1)
    names = [m["name"] for m in
             queue.group_member_stats("aligner.jobs.group")]
    assert "short-lived" not in names
    assert lingering in names


def test_worker_drops_undoable_task_instead_of_crash_looping(svc):
    """A task whose parameters the heuristic math rejects (dim != 24
    makes frequency_matrix/frequencies shapes clash) must not
    crash-loop the worker: its jobs are committed away with a warning
    and the queue drains."""
    disp, store, queue = svc
    req = dict(REQ, dimValue=20, rSquaredValue=40.0)
    code, resp = disp.validate(req)
    assert code == 200
    w = Worker(store, queue, batch=16, backend="xla")
    for _ in range(6):
        w.process_batch()
    assert queue.pending(TOPIC_JOBS) == 0  # dropped, not redelivered


def test_worker_drops_job_with_malformed_matrix(svc):
    """A decodable job whose matrix is missing/ragged raises from the
    batch prep (np.stack) — that is a deterministic failure and must be
    poison-committed, not crash the worker (which would leave the batch
    claimed and crash-loop every worker on redelivery)."""
    disp, store, queue = svc
    disp.validate(REQ)
    with queue._conn() as c:
        row = c.execute(
            "select id, payload from jobs limit 1").fetchone()
    payload = json.loads(row[1])
    payload["matrix"] = None  # models.py allows Option<matrix>
    with queue._conn() as c:
        c.execute("update jobs set payload = ? where id = ?",
                  (json.dumps(payload), row[0]))
    w = Worker(store, queue, batch=64, backend="xla")
    for _ in range(4):
        w.process_batch()
    assert queue.pending(TOPIC_JOBS) == 0  # nothing crash-looped


def test_worker_leaves_jobs_for_redelivery_on_transient_failure(svc, monkeypatch):
    """A transient (non-deterministic) failure — device/tunnel/infra —
    must NOT commit the jobs away as done: they stay claimed, lease
    expiry redelivers them, and a healthy retry completes the task
    (at-least-once, node/main.rs:78-88's spirit)."""
    import aligner_tpu.service.worker as worker_mod
    from aligner_tpu.service.queue import JobQueue as JQ

    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    real = worker_mod.heuristic_align_population
    boom = {"n": 0}

    def flaky(*a, **kw):
        boom["n"] += 1
        if boom["n"] <= 3:  # first pass: every task group fails
            raise RuntimeError("simulated tunnel reset")
        return real(*a, **kw)

    monkeypatch.setattr(worker_mod, "heuristic_align_population", flaky)
    orig_claim = JQ.claim_batch

    def short_lease_claim(self, topic, consumer, group="aligner.jobs.group",
                          limit=64, lease=120.0):
        return orig_claim(self, topic, consumer, group, limit, lease=0.05)

    monkeypatch.setattr(JQ, "claim_batch", short_lease_claim)
    w = Worker(store, queue, batch=64, backend="xla")
    w.process_batch()  # all groups hit the transient failure
    # nothing was committed away: the jobs are still claimed (not done)
    with queue._conn() as c:
        done = c.execute(
            "select count(1) from jobs where status = 'done'").fetchone()[0]
    assert done == 0
    time.sleep(0.1)  # past the short lease → redeliverable
    while queue.pending(TOPIC_JOBS) > 0:
        w.process_batch()
    for h in resp["hashes"]:
        assert store.get_percentage_by_hash(h) == 100.0


def test_calc_backfill_survives_nonstrict_characters(svc):
    """Sequences the pipeline accepted with strict=False (e.g. 'U')
    must not crash the p-value backfill forever (review r3)."""
    from aligner_tpu.cli.calc import run_once

    disp, store, queue = svc
    code, resp = disp.validate(dict(REQ, sequences=">a\nHEAGAWGHEEU\n>b\nPAWHEAEU\n"))
    h = resp["hashes"][0]
    mat = np.zeros((24, 24))
    for i in range(REQ["matricesVolumeValue"]):
        store.insert_align_subtask(h, float(i + 1), mat, "Q", "T",
                                   source_key=str(i))
    assert store.promote_if_complete(h)
    n = run_once(store, rng=np.random.default_rng(0), backend="xla",
                 n_sequences=12)
    assert n == 1
    assert store.get_ids_with_null_p_value() == []


def test_sequence_identifier_resolves_target_only_records(svc):
    """The LAST record of a request appears only as a target; its
    identifier must still resolve (review r3)."""
    disp, store, queue = svc
    disp.validate(dict(REQ, sequences=">first\nHEAGAWGHEE\n>last desc\nPAWHEAE\n"))
    assert store.get_sequence_by_identifier("last") == "PAWHEAE"
    assert store.get_sequence_by_identifier("first") == "HEAGAWGHEE"


def test_service_load_three_consecutive(tmp_path):
    """Load test (VERDICT r3 #4): dispatcher + two competing workers
    drain a multi-task load (3 pairs x 8 matrices) all the way to
    promotion, THREE consecutive rounds on fresh state — exactly-once
    handling, every task promoted, queue fully drained, no orphan
    subtask rows.  bench_service.py measures the same pipeline's
    throughput (service_e2e_throughput / service_queue_throughput)."""
    for round_i in range(3):
        db = str(tmp_path / f"load{round_i}.db")
        store, queue = Store(db), JobQueue(db)
        disp = Dispatcher(store, queue, rng=np.random.default_rng(round_i))
        code, resp = disp.validate(dict(REQ, matricesVolumeValue=8))
        assert code == 200
        hashes = resp["hashes"]
        assert queue.pending(TOPIC_JOBS) == 8 * len(hashes)
        ws = [
            Worker(store, queue, name=f"load-w{i}", batch=8, backend="xla")
            for i in range(2)
        ]

        def drain(w):
            while queue.pending(TOPIC_JOBS) > 0:
                w.process_batch()

        ts = [threading.Thread(target=drain, args=(w,)) for w in ws]
        [t.start() for t in ts]
        [t.join(timeout=300) for t in ts]
        assert queue.pending(TOPIC_JOBS) == 0
        snap = disp.progress_snapshot(hashes)  # promotes at >=100%
        for h in hashes:
            assert snap["progress"][h] == 100.0
            assert store.get_status_by_hash(h) == "DONE"
            tid = store.get_task_id_by_hash(h)
            assert store.get_result_matrix_by_task_id(tid) is not None
            # promotion removed the subtask rows — no orphans
            assert store.get_percentage_by_hash(h) == 0.0


def test_heartbeat_extends_leases(tmp_path):
    """A heartbeating consumer's claimed jobs do NOT lease-expire: the
    heartbeat pushes lease_until forward (Kafka max.poll.interval-style
    liveness, node/main.rs:32-44), so a slow-but-alive worker keeps its
    batch while a silent one still loses it."""
    q = JobQueue(str(tmp_path / "q.db"))
    q.produce(TOPIC_JOBS, "p1")
    a = q.claim_batch(TOPIC_JOBS, "c1", lease=0.05)
    assert len(a) == 1
    q.heartbeat("c1", "aligner.jobs.group", lease=60.0,
                job_ids=[a[0][0]])
    time.sleep(0.1)  # past the ORIGINAL lease
    assert q.claim_batch(TOPIC_JOBS, "c2") == []  # still owned by c1
    # but a consumer that stops heartbeating does lose the job
    q.produce(TOPIC_JOBS, "p2")
    b = q.claim_batch(TOPIC_JOBS, "c3", lease=0.02)
    assert len(b) == 1
    time.sleep(0.05)
    assert len(q.claim_batch(TOPIC_JOBS, "c4")) == 1  # redelivered


def test_heartbeat_without_ids_does_not_extend(tmp_path):
    """Lease extension is scoped to the ids the worker is actually
    processing: a bare registry heartbeat (the worker's per-poll call,
    or a restarted worker reusing a name) must NOT keep alive a job
    that was deliberately left claimed for lease-expiry redelivery
    (double store failure) — otherwise it is starved for as long as the
    worker keeps polling."""
    q = JobQueue(str(tmp_path / "q.db"))
    q.produce(TOPIC_JOBS, "p1")
    a = q.claim_batch(TOPIC_JOBS, "c1", lease=0.05)
    assert len(a) == 1
    q.heartbeat("c1", "aligner.jobs.group", lease=60.0)  # registry only
    time.sleep(0.1)
    assert len(q.claim_batch(TOPIC_JOBS, "c2")) == 1  # redelivered


def test_heartbeat_cannot_steal_back_reclaimed_job(tmp_path):
    """Once an expired job was reclaimed by another consumer, the
    original owner's heartbeat must not re-extend it (ownership moved —
    the consumer column gates the lease update)."""
    q = JobQueue(str(tmp_path / "q.db"))
    q.produce(TOPIC_JOBS, "p1")
    a = q.claim_batch(TOPIC_JOBS, "c1", lease=0.02)
    assert len(a) == 1
    time.sleep(0.05)
    b = q.claim_batch(TOPIC_JOBS, "c2", lease=30.0)  # reclaim after expiry
    assert len(b) == 1
    q.heartbeat("c1", "aligner.jobs.group", lease=60.0,
                job_ids=[b[0][0]])
    with q._conn() as c:
        owner, until = c.execute(
            "select consumer, lease_until from jobs where id = ?", (b[0][0],)
        ).fetchone()
    assert owner == "c2"
    assert until <= time.time() + 31.0  # c1's 60s extension did not apply


def test_slow_worker_keeps_batch_while_heartbeating(svc, monkeypatch):
    """End-to-end cold-compile scenario: a worker whose compute takes
    longer than the job lease does NOT have its batch redelivered,
    because _LeaseKeeper heartbeats extend the leases mid-processing."""
    import aligner_tpu.service.worker as worker_mod

    disp, store, queue = svc
    disp.validate(REQ)

    slow_called = {}
    real = worker_mod.heuristic_align_population

    def slow_population(*args, **kw):
        # simulate a long first compile: several heartbeat intervals
        # longer than the (shrunk) lease below
        time.sleep(0.6)
        slow_called["yes"] = True
        return real(*args, **kw)

    monkeypatch.setattr(worker_mod, "heuristic_align_population",
                        slow_population)
    # shrink the lease and the keeper interval so the scenario runs fast
    orig_claim = JobQueue.claim_batch

    def short_lease_claim(self, topic, consumer, group="aligner.jobs.group",
                          limit=64, lease=120.0):
        return orig_claim(self, topic, consumer, group, limit, lease=0.2)

    monkeypatch.setattr(JobQueue, "claim_batch", short_lease_claim)
    monkeypatch.setattr(worker_mod._LeaseKeeper, "__init__",
                        lambda self, q, n, g, job_ids=None, interval=0.05:
                        _LeaseKeeper_init(self, q, n, g, job_ids, interval))
    w = Worker(store, queue, name="slowpoke", batch=64, backend="xla")
    handled = w.process_batch()
    assert slow_called.get("yes")
    assert handled == 9
    # nothing was redelivered to anyone else: every job is done
    assert queue.pending(TOPIC_JOBS) == 0
    with queue._conn() as c:
        others = c.execute(
            "select count(1) from jobs where consumer != 'slowpoke'"
        ).fetchone()[0]
    assert others == 0


def _LeaseKeeper_init(self, q, n, g, job_ids, interval):
    import threading as _t

    self._queue, self._name, self._group = q, n, g
    self._job_ids = list(job_ids or [])
    self._interval = interval
    self._stop = _t.Event()
    self._thread = _t.Thread(target=self._run, daemon=True)


def test_worker_warmup_claims_nothing(svc):
    """--warmup precompiles against real pending payloads without taking
    any lease: every job stays ready and is still claimable afterwards."""
    disp, store, queue = svc
    disp.validate(REQ)
    before = queue.pending(TOPIC_JOBS)
    w = Worker(store, queue, name="warm", batch=64, backend="xla")
    groups = w.warmup()
    assert groups == 3  # one per pair-task
    assert queue.pending(TOPIC_JOBS) == before
    with queue._conn() as c:
        claimed = c.execute(
            "select count(1) from jobs where status != 'ready'"
        ).fetchone()[0]
    assert claimed == 0
    # and the warmed worker still processes everything
    assert w.process_batch() == before
    assert queue.pending(TOPIC_JOBS) == 0


def test_worker_fused_population_end_to_end(svc, monkeypatch):
    """The worker's whole pipeline with the fused device population loop
    (ALIGNER_POP_DEVICE_LOOP=1): same task lifecycle — claims, stores
    subtasks, promotes — with the loop running as one device dispatch."""
    monkeypatch.setenv("ALIGNER_POP_DEVICE_LOOP", "1")
    disp, store, queue = svc
    code, resp = disp.validate(REQ)
    assert code == 200
    w = Worker(store, queue, name="fused", batch=64, backend="xla")
    w.warmup()  # compiles the fused loop + final launch for these shapes
    assert w.process_batch() == 9
    assert queue.pending(TOPIC_JOBS) == 0
    for h in resp["hashes"]:
        assert store.get_percentage_by_hash(h) == 100.0
    updater_run(store)
    for h in resp["hashes"]:
        tid = store.get_task_id_by_hash(h)
        row = store.get_result_matrix_by_task_id(tid)
        assert row is not None
