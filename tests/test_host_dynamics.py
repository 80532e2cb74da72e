"""Host-shard dynamics: hot-host skew fairness, idle eviction with
surviving counts, runtime politeness control."""

import numpy as np
import pyarrow as pa

from bubing_ray.frontier.hosts import HostShardState


def _tbl(rows):
    return pa.table(
        {
            "sa": pa.array([r[0] for r in rows], pa.string()),
            "pq": pa.array([r[1] for r in rows], pa.string()),
            "seq": pa.array([r[2] for r in rows], pa.int64()),
            "ip": pa.array([r[3] for r in rows], pa.uint32()),
        }
    )


def test_hot_host_cannot_dominate_rounds(tmp_path):
    """Politeness + keepalive bound a hot host to <= keepalive URLs per
    round, so a 100x-skewed host cannot starve cold hosts (the skew
    story of SURVEY §4.1: per-host caps + IP serialization)."""
    st = HostShardState(0, sa_delay_ms=0, ip_delay_ms=0, keepalive=4,
                       head_cap=8, spill_dir=str(tmp_path / "sp"),
                       spill_segment_rows=64)
    rows = [("http://hot.x", f"/p/{i}", i, 1) for i in range(1000)]
    rows += [("http://cold.x", f"/p/{i}", 1000 + i, 2) for i in range(10)]
    st.absorb(_tbl(rows))
    # robots pass first: fetch and report robots for both hosts
    t = st.emit_ready(0, 10_000)
    assert set(t.column("sa").to_pylist()) == {"http://hot.x", "http://cold.x"}
    assert t.column("is_robots").to_pylist() == [True, True]
    st.report(pa.table({
        "sa": t.column("sa"), "pq": t.column("pq"), "seq": t.column("seq"),
        "is_robots": t.column("is_robots"),
        "status": pa.array([404, 404], pa.int32()),
        "error": pa.array([None, None], pa.string()),
        "robots_body": pa.array([None, None], pa.binary()),
    }), 10)
    hot_total = cold_total = 0
    now = 20
    for _ in range(10):
        t = st.emit_ready(now, 10_000)
        counts = {}
        for sa in t.column("sa").to_pylist():
            counts[sa] = counts.get(sa, 0) + 1
        assert counts.get("http://hot.x", 0) <= 4   # keepalive bound
        hot_total += counts.get("http://hot.x", 0)
        cold_total += counts.get("http://cold.x", 0)
        st.report(pa.table({
            "sa": t.column("sa"), "pq": t.column("pq"), "seq": t.column("seq"),
            "is_robots": t.column("is_robots"),
            "status": pa.array([200] * t.num_rows, pa.int32()),
            "error": pa.array([None] * t.num_rows, pa.string()),
            "robots_body": pa.array([None] * t.num_rows, pa.binary()),
        }), now + 10)
        now += 20
    assert cold_total == 10          # cold host fully served
    assert hot_total <= 40           # hot host strictly rate-limited
    # spilled tail sits in seq-ranged segments (the (host, seq//K) split)
    assert st.hosts["http://hot.x"].spilled > 0


def _brute_next_event(st):
    best = None
    for h in st.hosts.values():
        if h.purged or not h.queue or h.in_flight or h.robots_in_flight:
            continue
        t = max(h.next_fetch, st.ip_next.get(h.ip, 0))
        if best is None or t < best:
            best = t
    return best


def test_heap_index_matches_full_scan(tmp_path):
    """The lazy ready-heap must agree with a brute-force shard scan
    (next_event) and the maintained RAM-queue counter with a full sum,
    through a randomized absorb/emit/report/error workload including
    spill refills and retries."""
    rng = np.random.default_rng(5)
    st = HostShardState(0, sa_delay_ms=50, ip_delay_ms=30, keepalive=3,
                        head_cap=6, spill_dir=str(tmp_path / "sp"),
                        spill_segment_rows=32)
    seq = 0
    now = 0
    for step in range(60):
        # random absorbs (hosts share IPs -> election contention)
        n_new = int(rng.integers(0, 20))
        rows = []
        for _ in range(n_new):
            hid = int(rng.integers(0, 12))
            rows.append((f"http://h{hid}.x", f"/p/{seq}", seq, 1 + hid % 4))
            seq += 1
        if rows:
            st.absorb(_tbl(rows))
        t = st.emit_ready(now, int(rng.integers(1, 12)))
        if t.num_rows:
            errs = [
                "socket_timeout" if rng.random() < 0.15 else None
                for _ in range(t.num_rows)
            ]
            st.report(pa.table({
                "sa": t.column("sa"), "pq": t.column("pq"),
                "seq": t.column("seq"), "is_robots": t.column("is_robots"),
                "status": pa.array([200] * t.num_rows, pa.int32()),
                "error": pa.array(errs, pa.string()),
                "robots_body": pa.array([None] * t.num_rows, pa.binary()),
            }), now + 7)
        assert st.next_event() == _brute_next_event(st), f"step {step}"
        assert st._ram_queued == sum(
            len(h.queue) for h in st.hosts.values()), f"step {step}"
        ne = st.next_event()
        now = max(now + 11, ne if ne is not None else now + 11)


def test_idle_eviction_preserves_counts():
    st = HostShardState(0, sa_delay_ms=100, max_urls_per_host=5,
                       host_idle_expiry_ms=1000)
    st.absorb(_tbl([("http://a.x", f"/p/{i}", i, 1) for i in range(3)]))
    st.emit_ready(0, 100)  # commits absorb; emits robots
    h = st.hosts["http://a.x"]
    assert h.enqueued == 3
    # drain: simulate all fetched, queue empty, far-future idle
    h.queue.clear()
    h.robots_in_flight = False
    h.next_fetch = 0
    st.emit_ready(5000, 100)  # idle > expiry -> evicted
    assert "http://a.x" not in st.hosts
    assert st.counters["evicted_hosts"] == 1
    # re-absorb: count survives, per-host cap still enforced
    st.absorb(_tbl([("http://a.x", f"/q/{i}", 10 + i, 1) for i in range(5)]))
    st.emit_ready(6000, 100)
    h2 = st.hosts["http://a.x"]
    assert h2.enqueued == 5  # 3 survived + 2 admitted (cap 5)
    assert st.counters["dropped_cap"] == 3


def test_set_politeness():
    st = HostShardState(0, sa_delay_ms=100, keepalive=2)
    out = st.set_politeness(sa_delay_ms=500, keepalive=7)
    assert out["sa_delay"] == 500 and out["keepalive"] == 7
    assert out["ip_delay"] == st.ip_delay
    assert st.sa_delay == 500 and st.keepalive == 7
    out = st.set_politeness(keepalive_time_ms=2000, ip_delay_factor=1.0,
                            n_agents=4)
    assert st.keepalive_time == 2000
    assert st.ip_delay_factor == 1.0 and st.n_agents == 4
    assert out["sa_delay"] == 500  # earlier setting retained
