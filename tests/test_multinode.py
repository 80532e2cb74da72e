"""Executed multi-node evidence for the placement modes.

The reference's scaling story is multi-agent (Agent.java:95-98, JGroups
URL routing in Frontier.java:622-638); this engine's equivalent is
``CrawlConfig.placement``.  The sandbox has one machine, so the test
starts a SIMULATED two-node Ray cluster (ray.cluster_utils.Cluster —
two raylets, two plasma stores, separate resource pools on one box) in
a subprocess (the pytest session already owns a single-node Ray), runs
a small crawl under ``placement="pair"``, and asserts

- the host-shard actors actually land on BOTH nodes (placement-group
  SPREAD bundles work as documented in docs/MULTINODE.md), and
- the fetched URL set is byte-identical to a single-node run of the
  same crawl (placement changes scheduling, never results).
"""

import json
import os
import subprocess
import sys

import pytest

REPO = os.path.dirname(os.path.dirname(os.path.abspath(__file__)))

_SCRIPT = r"""
import hashlib
import json
import os
import sys

mode, web, store = sys.argv[1], sys.argv[2], sys.argv[3]

import ray

if mode == "multi":
    from ray.cluster_utils import Cluster

    cluster = Cluster(initialize_head=True,
                      head_node_args={"num_cpus": 4,
                                      "include_dashboard": False})
    cluster.add_node(num_cpus=4)
    ray.init(address=cluster.address, include_dashboard=False,
             logging_level="ERROR")
    alive = [n for n in ray.nodes() if n["Alive"]]
    assert len(alive) == 2, f"expected 2 nodes, got {len(alive)}"
else:
    ray.init(address="local", num_cpus=4, include_dashboard=False,
             logging_level="ERROR")

from bubing_ray import pages
from bubing_ray.frontier.crawl import CrawlConfig, Crawler

cfg = CrawlConfig(
    pages_dir=web, store_dir=store, seeds=pages.seeds_for(6),
    n_host_shards=4, n_sieve_shards=2, n_digest_shards=2,
    sa_delay_ms=200, ip_delay_ms=100, round_ms=200,
    retry_quantum_ms=60_000, store_html=False,
    placement="pair" if mode == "multi" else "none",
)
c = Crawler(cfg)
nodes = set(ray.get([h.node_id.remote() for h in c.hosts]))
c.add_seeds(cfg.seeds)
c.run()
c.shutdown()

import pyarrow.dataset as pds

t = pds.dataset(store, format="parquet").to_table(columns=["url"])
urls = sorted(t.column("url").to_pylist())
print("RESULT " + json.dumps({
    "mode": mode,
    "n_nodes_used": len(nodes),
    "n_urls": len(urls),
    "url_hash": hashlib.sha256("\n".join(urls).encode()).hexdigest(),
}))
ray.shutdown()
"""


def _run(mode: str, tmp_path) -> dict:
    web = str(tmp_path / f"web_{mode}")
    store = str(tmp_path / f"store_{mode}")
    from bubing_ray import pages

    pages.write_pages(web, n_hosts=6, pages_per_host=8, out_degree=4, seed=3)
    env = dict(os.environ)
    env.pop("RAY_ADDRESS", None)  # the subprocess owns its own cluster
    out = subprocess.run(
        [sys.executable, "-c", _SCRIPT, mode, web, store],
        capture_output=True, text=True, timeout=420, cwd=REPO, env=env,
    )
    assert out.returncode == 0, f"{mode} run failed:\n{out.stdout}\n{out.stderr}"
    line = [ln for ln in out.stdout.splitlines() if ln.startswith("RESULT ")]
    assert line, f"no RESULT line in:\n{out.stdout}\n{out.stderr}"
    return json.loads(line[-1][len("RESULT "):])


@pytest.mark.timeout(900)
def test_pair_placement_two_nodes_matches_single_node(tmp_path):
    multi = _run("multi", tmp_path)
    single = _run("single", tmp_path)
    # SPREAD placement-group bundles must actually use both nodes
    assert multi["n_nodes_used"] == 2, multi
    assert single["n_nodes_used"] == 1, single
    # identical crawl result regardless of placement
    assert multi["n_urls"] == single["n_urls"] > 0
    assert multi["url_hash"] == single["url_hash"]
