"""Job system concurrency tests (model: reference jobs.rs:173-283,387-495)."""

import threading
import time

from voxelrs_tpu.systems.jobs import ChunkProcessor, JobSystem
from voxelrs_tpu.world.chunk import ChunkPos


def make_js():
    return JobSystem(2)


def test_jobs_run_and_drain():
    js = make_js()
    done = []
    lock = threading.Lock()
    for i in range(20):
        js.push(False, lambda i=i: (lock.acquire(), done.append(i), lock.release()))
    assert js.wait_until_processed(5)
    assert sorted(done) == list(range(20))
    js.stop()


def test_priority_lane():
    js = JobSystem(1)
    order = []
    gate = threading.Event()
    js.push(False, gate.wait)  # occupy the single worker
    time.sleep(0.05)
    js.push(False, lambda: order.append("normal"))
    js.push(True, lambda: order.append("prio"))
    gate.set()
    assert js.wait_until_processed(5)
    assert order == ["prio", "normal"]
    js.stop()


def test_cancellation():
    js = JobSystem(1)
    gate = threading.Event()
    ran = []
    js.push(False, gate.wait)
    h = js.push(False, lambda: ran.append(1))
    h.cancel()
    gate.set()
    assert js.wait_until_processed(5)
    assert ran == []
    js.stop()


def test_clear_drops_queued():
    js = JobSystem(1)
    gate = threading.Event()
    ran = []
    js.push(False, gate.wait)
    for _ in range(5):
        js.push(False, lambda: ran.append(1))
    js.clear()
    gate.set()
    assert js.wait_until_processed(5)
    assert ran == []
    js.stop()


def test_exception_isolation():
    js = JobSystem(1)
    ran = []

    def boom():
        raise RuntimeError("job panic")

    js.push(False, boom)
    js.push(False, lambda: ran.append(1))
    assert js.wait_until_processed(5)
    assert ran == [1]
    js.stop()


def test_chunk_processor_dedup():
    js = JobSystem(1)
    proc = ChunkProcessor(js)
    gate = threading.Event()
    js.push(False, gate.wait)  # hold the worker so enqueues stack up

    pos = ChunkPos(1, 2, 3)
    proc.enqueue(pos, False, lambda: "first")
    proc.enqueue(pos, False, lambda: "second")  # cancels "first"
    gate.set()
    assert js.wait_until_processed(5)

    results = proc.get_results(10)
    assert [r.value for r in results] == ["second"]
    assert not proc.has_pending()
    js.stop()


def test_chunk_processor_dequeue_discards_results():
    js = JobSystem(2)
    proc = ChunkProcessor(js)
    pos = ChunkPos(0, 0, 0)
    proc.enqueue(pos, False, lambda: "gone")
    assert js.wait_until_processed(5)
    proc.dequeue(pos)
    assert proc.get_results(10) == []
    js.stop()


def test_chunk_processor_result_limit():
    js = JobSystem(2)
    proc = ChunkProcessor(js)
    for i in range(10):
        proc.enqueue(ChunkPos(i, 0, 0), False, lambda i=i: i)
    assert js.wait_until_processed(5)
    first = proc.get_results(4)
    rest = proc.get_results(100)
    assert len(first) == 4 and len(rest) == 6
    js.stop()
