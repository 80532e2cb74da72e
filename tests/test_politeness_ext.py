"""keepAliveTime-window batching and multi-agent ipDelay attenuation
(pure HostShardState unit tests, virtual clock)."""

import numpy as np
import pyarrow as pa

from bubing_ray.frontier.hosts import HostShardState


def _absorb(s, sa, pqs, ip=1, seq0=0):
    s.absorb(
        pa.table(
            {
                "sa": pa.array([sa] * len(pqs), pa.string()),
                "pq": pa.array(pqs, pa.string()),
                "seq": pa.array(np.arange(seq0, seq0 + len(pqs)), pa.int64()),
                "ip": pa.array(np.full(len(pqs), ip, np.uint32)),
            }
        )
    )


def _report(s, rows, now_end):
    """rows: list of dicts with sa, is_robots, status, error, warc_ts."""
    s.report(
        pa.table(
            {
                "sa": pa.array([r["sa"] for r in rows], pa.string()),
                "is_robots": pa.array([r.get("is_robots", False) for r in rows]),
                "status": pa.array(
                    np.array([r.get("status", 200) for r in rows], np.int32)
                ),
                "error": pa.array([r.get("error") for r in rows], pa.string()),
                "html": pa.array([r.get("body", b"") for r in rows], pa.binary()),
                "pq": pa.array([r.get("pq", "/") for r in rows], pa.string()),
                "seq": pa.array([r.get("seq", -2) for r in rows], pa.int64()),
                "warc_ts": pa.array(
                    np.array([r.get("warc_ts", 0) for r in rows], np.int64)
                ),
            }
        ),
        now_end,
    )


def _pass_robots(s, sa, now=0):
    t = s.emit_ready(now, 100)
    assert t.column("is_robots").to_pylist() == [True]
    _report(s, [{"sa": sa, "is_robots": True, "status": 404}], now + 1)


def test_keepalive_time_window_prior_and_ewma():
    s = HostShardState(
        sa_delay_ms=10, ip_delay_ms=10, keepalive=32,
        keepalive_time_ms=1000, fetch_cost_prior_ms=100,
        real_clock=True,  # simulate http mode: warc_ts is wall clock
    )
    sa = "http://h.example"
    _absorb(s, sa, [f"/p/{i}" for i in range(30)])
    _pass_robots(s, sa)
    t = s.emit_ready(100, 100)
    # prior 100ms -> window predicts 1000/100 = 10 URLs (not 32)
    assert t.num_rows == 10
    # observed spacing 500ms -> EWMA 500 -> window caps at 2
    rows = [
        {"sa": sa, "pq": p, "warc_ts": 10_000 + 500 * i}
        for i, p in enumerate(t.column("pq").to_pylist())
    ]
    _report(s, rows, 150)
    t2 = s.emit_ready(1000, 100)
    assert t2.num_rows == 2


def test_keepalive_time_off_is_count_based():
    s = HostShardState(sa_delay_ms=10, ip_delay_ms=10, keepalive=5)
    sa = "http://h.example"
    _absorb(s, sa, [f"/p/{i}" for i in range(30)])
    _pass_robots(s, sa)
    assert s.emit_ready(100, 100).num_rows == 5


def test_ip_delay_attenuation():
    def mk(factor, agents):
        s = HostShardState(
            sa_delay_ms=10, ip_delay_ms=100,
            ip_delay_factor=factor, n_agents=agents,
        )
        _absorb(s, "http://a.example", ["/1"], ip=9)
        _absorb(s, "http://b.example", ["/1"], ip=9, seq0=10)
        s.commit_absorb()
        return s

    # k=2 hosts on the IP, factor=1, 3 agents -> 100 * (2/3) * 3 = 200
    s = mk(1.0, 3)
    _report(s, [{"sa": "http://a.example"}], 1000)
    assert s.ip_next[9] == 1200
    # factor 0 (default): plain ipDelay
    s0 = mk(0.0, 3)
    _report(s0, [{"sa": "http://a.example"}], 1000)
    assert s0.ip_next[9] == 1100
    # attenuation never goes below the configured ipDelay
    s_lo = mk(0.1, 1)
    _report(s_lo, [{"sa": "http://a.example"}], 1000)
    assert s_lo.ip_next[9] == 1100


def test_keepalive_time_ignores_fake_timestamps_in_pages_mode():
    # Regression (round-2 ADVICE): in pages mode warc_ts is the synthetic
    # generator's fake page timestamp; deltas of hours-as-ms must not
    # feed the EWMA (which would collapse every batch to 1 URL).
    s = HostShardState(
        sa_delay_ms=10, ip_delay_ms=10, keepalive=32,
        keepalive_time_ms=1000, fetch_cost_prior_ms=100,
        real_clock=False,
    )
    sa = "http://h.example"
    _absorb(s, sa, [f"/p/{i}" for i in range(30)])
    _pass_robots(s, sa)
    t = s.emit_ready(100, 100)
    assert t.num_rows == 10  # prior-based window
    rows = [
        {"sa": sa, "pq": p, "warc_ts": 10_000_000 + 3_600_000 * i}
        for i, p in enumerate(t.column("pq").to_pylist())
    ]
    _report(s, rows, 150)
    h = s.hosts[sa]
    assert h.ewma_fetch_ms == 0.0  # fake clock never sampled
    t2 = s.emit_ready(1000, 100)
    assert t2.num_rows == 10  # window still uses the prior, not garbage
