"""Replay buffer tests (reference test/test_stereo_reservoir.py:14-29 and
test_stereo_priority_queue.py:13-32 behavioral contracts)."""

import random

import numpy as np

from adaptive_stereo_tpu.utils import StereoPriorityQueue, StereoReservoir


def test_reservoir_uniformity():
    """Algorithm R statistical test: streaming 0..999 into a size-10 buffer
    many times, the mean stored value approaches 499.5."""
    means = []
    for trial in range(300):
        r = StereoReservoir(10, rng=random.Random(trial))
        for i in range(1000):
            r.add(None, None, float(i), i)
        means.append(np.mean([item[0] for item in r.buf]))
    assert abs(np.mean(means) - 499.5) < 25


def test_reservoir_dedup_and_size_cap():
    r = StereoReservoir(4, rng=random.Random(0))
    for i in range(4):
        assert r.add(None, None, float(i), i)
    assert not r.add(None, None, 99.0, 2)  # duplicate index rejected
    for i in range(4, 50):
        r.add(None, None, float(i), i)
    assert r.size() == 4


def test_reservoir_update_and_average():
    r = StereoReservoir(3, rng=random.Random(0))
    for i in range(3):
        r.add(None, None, float(i), i)
    r.update_value(0, 9.0)
    assert abs(r.average_value() - (9 + 1 + 2) / 3) < 1e-12


def test_priority_queue_min_heap_semantics():
    q = StereoPriorityQueue(3, min_heap=True)
    for v, i in [(5.0, 0), (1.0, 1), (3.0, 2)]:
        assert q.add(None, None, v, i)
    assert q.size() == 3
    # Full: a better (smaller) value replaces the worst; a worse one is
    # rejected.
    assert q.add(None, None, 2.0, 3)
    assert not q.add(None, None, 10.0, 4)
    assert q.size() == 3
    values = sorted(item[0] for item in q.buf)
    assert values == [1.0, 2.0, 3.0]
    assert q.pop()[0] == 1.0


def test_priority_queue_max_heap_semantics():
    q = StereoPriorityQueue(2, min_heap=False)
    q.add(None, None, 1.0, 0)
    q.add(None, None, 5.0, 1)
    assert q.add(None, None, 3.0, 2)      # 3 > min(1,5)=1 -> replaces it
    assert not q.add(None, None, 0.5, 3)  # worse than everything
    assert abs(q.average_value() - 4.0) < 1e-12


def test_priority_queue_ovs_policy_accounting():
    """Gradient-update accounting contract of ovs_policy='priority_queue'
    (engine/adapt.py:_PriorityQueueOVS): pre_decide is unconditionally
    add=True, so the device masks the Adam update for EVERY novel frame —
    including frames the heap then declines to store. This makes the PQ
    mode's gradient_updates counter intentionally non-comparable with the
    reservoir mode (whose pre-draw always matches its commit)."""
    from adaptive_stereo_tpu.engine.adapt import _PriorityQueueOVS

    ovs = _PriorityQueueOVS(2)
    img = np.zeros((2, 2), np.float32)

    skipped_updates = 0      # what the device counter would record
    stored = []
    for idx, loss in enumerate([5.0, 3.0, 1.0, 4.0]):
        pre = ovs.pre_decide(idx)
        assert pre.add           # novel frame ALWAYS diverts from the update
        skipped_updates += 1     # do_update = ~(novel & pre.add) = False
        stored.append(ovs.commit(pre, img, img, loss, idx))

    # Max-heap keeps the WORST-loss pairs: 1.0 is rejected at commit time
    # (the buffer discarded the frame, yet its update was already skipped).
    assert stored == [True, True, False, True]
    assert skipped_updates == 4
    assert ovs.size() == 2
    assert sorted(it[0] for it in ovs.buf) == [4.0, 5.0]

    # Reservoir pre-draw, by contrast, always matches its commit.
    res = StereoReservoir(2, rng=random.Random(0))
    for idx in range(20):
        pre = res.pre_decide(idx)
        did = res.commit(pre, img, img, float(idx), idx)
        assert did == pre.add
