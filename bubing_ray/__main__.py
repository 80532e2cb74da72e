"""CLI — the runtime-control surface (the reference's Agent.main +
JMX operations, Agent.java:674-708,187-330, become subcommands).

  python -m bubing_ray genweb  --out DIR --hosts N --pages N [--body-blocks K]
  python -m bubing_ray crawl   --pages-dir DIR --store-dir DIR
                               [--seeds-file F | --seeds URL ...]
                               [--max-urls N] [--resume] [--checkpoint-every K]
  python -m bubing_ray stats   --store-dir DIR
  python -m bubing_ray process --store-dir DIR --processor text|uri|digest
                               [--out DIR]
  python -m bubing_ray warc-export --store-dir DIR --out F.warc.gz
  python -m bubing_ray warc-index  --path F.warc.gz [--out index.parquet]
  python -m bubing_ray warc-ingest --paths F.warc.gz ... --out DIR

Owns its Ray session (guarded init) — library code never calls
ray.init().
"""

from __future__ import annotations

import argparse
import json
import sys


def _ray():
    import ray

    if not ray.is_initialized():
        ray.init(address="local", include_dashboard=False, logging_level="ERROR")
    return ray


def cmd_genweb(args):
    _ray()
    from .pages import write_pages

    write_pages(args.out, n_hosts=args.hosts, pages_per_host=args.pages,
                out_degree=args.out_degree, seed=args.seed,
                body_blocks=args.body_blocks)
    print(json.dumps({"out": args.out, "pages": args.hosts * args.pages}))


def cmd_crawl(args):
    _ray()
    from .frontier.crawl import CrawlConfig, crawl
    from .sources.seeds import read_seeds

    seeds = read_seeds(args.seeds_file) if args.seeds_file else list(args.seeds or [])
    cfg = CrawlConfig(
        pages_dir=args.pages_dir,
        store_dir=args.store_dir,
        seeds=seeds,
        max_urls=args.max_urls,
        sa_delay_ms=args.sa_delay_ms,
        ip_delay_ms=args.ip_delay_ms,
        round_ms=args.round_ms,
        keepalive=args.keepalive,
        n_host_shards=args.host_shards,
        n_sieve_shards=args.sieve_shards,
        n_digest_shards=args.digest_shards,
        checkpoint_every=args.checkpoint_every,
        store_html=not args.no_html,
        retry_quantum_ms=args.retry_quantum_ms,
        blacklist_hosts=tuple(args.blacklist_host or ()),
        blacklist_ips=tuple(args.blacklist_ip or ()),
    )
    stats = crawl(cfg, resume=args.resume)
    print(json.dumps(stats))


def cmd_stats(args):
    _ray()
    from .ops.store_tools import store_stats

    print(json.dumps(store_stats(args.store_dir)))


def cmd_process(args):
    _ray()
    from .ops.store_tools import process_store

    ds = process_store(args.store_dir, processor=args.processor,
                       out_dir=args.out, preserve_order=args.preserve_order)
    if ds is not None:
        print(json.dumps({"rows": ds.count()}))


def cmd_corpus(args):
    """Store -> training corpus: 200-status pages -> Gopher-style
    quality gate -> exact keep-first dedup -> partitioned Parquet."""
    _ray()
    from .pipelines.queries import corpus_from_store

    corpus_from_store(
        args.store_dir, args.min_words, args.min_stop
    ).write_parquet(args.out)
    print(json.dumps({"out": args.out}))


def cmd_export(args):
    """Resumable sharded export: glob parquet inputs -> quality-score
    transform -> out_dir/shard-<i> with skip-finished markers (rerun
    after a crash resumes at shard granularity)."""
    _ray()
    import glob as _glob

    from .ops.text import token_quality_batch
    from .pipelines.resume import resumable_write

    files = sorted(_glob.glob(args.inputs))
    st = resumable_write(
        files, args.out,
        lambda ds: ds.map_batches(token_quality_batch,
                                  batch_format="pyarrow"),
        shard_size=args.shard_size,
        columns=["doc_id", "text"])
    print(json.dumps({"out": args.out, **st}))


def cmd_warc_export(args):
    """Store partitions -> one WARC archive (WarcCompressor analogue),
    streamed batch-by-batch (never the whole store in memory)."""
    import pyarrow.dataset as pads

    from .sources.warc import write_warc

    ds = pads.dataset(args.store_dir, partitioning="hive")
    # fidelity columns (digest -> WARC-Payload-Digest, is_duplicate /
    # charset -> BUbiNG extension headers) ride along when the store
    # has them (store/WarcStore.java:67-75)
    cols = [c for c in ("url", "warc_ts", "html", "status", "content_type",
                        "location", "digest64", "digest", "is_duplicate",
                        "charset") if c in ds.schema.names]

    def rows():
        for batch in ds.to_batches(columns=cols):
            d = batch.to_pydict()
            yield from (
                dict(zip(cols, vals)) for vals in zip(*[d[c] for c in cols])
            )

    n = write_warc(rows(), args.out, compress=args.out.endswith(".gz"),
                   warcinfo=True, requests=True)
    print(json.dumps({"out": args.out, "records": n}))


def cmd_warc_index(args):
    """Per-gzip-member index of a .warc.gz (GZIPIndexer analogue)."""
    from .sources.warc import index_warc_gz

    idx = index_warc_gz(args.path)
    if args.out:
        import pyarrow.parquet as pq

        pq.write_table(idx, args.out)
    print(json.dumps({"path": args.path, "records": idx.num_rows,
                      "out": args.out}))


def cmd_warc_ingest(args):
    """WARC file(s) -> pages-schema Parquet via the streaming reader."""
    _ray()
    from .sources.warc import read_warc

    ds = read_warc(list(args.paths))
    ds.write_parquet(args.out)
    print(json.dumps({"out": args.out}))


def main(argv=None) -> int:
    p = argparse.ArgumentParser(prog="bubing_ray")
    sub = p.add_subparsers(dest="cmd", required=True)

    g = sub.add_parser("genweb")
    g.add_argument("--out", required=True)
    g.add_argument("--hosts", type=int, default=100)
    g.add_argument("--pages", type=int, default=50)
    g.add_argument("--out-degree", type=int, default=8)
    g.add_argument("--seed", type=int, default=0)
    g.add_argument("--body-blocks", type=int, default=1)
    g.set_defaults(fn=cmd_genweb)

    c = sub.add_parser("crawl")
    c.add_argument("--pages-dir", required=True)
    c.add_argument("--store-dir", required=True)
    c.add_argument("--seeds-file")
    c.add_argument("--seeds", nargs="*")
    c.add_argument("--max-urls", type=int, default=1 << 40)
    c.add_argument("--sa-delay-ms", type=int, default=4000)
    c.add_argument("--ip-delay-ms", type=int, default=500)
    c.add_argument("--round-ms", type=int, default=1000)
    c.add_argument("--keepalive", type=int, default=2)
    c.add_argument("--host-shards", type=int, default=8)
    c.add_argument("--sieve-shards", type=int, default=8)
    c.add_argument("--digest-shards", type=int, default=4)
    c.add_argument("--checkpoint-every", type=int, default=0)
    c.add_argument("--retry-quantum-ms", type=int, default=0)
    c.add_argument("--no-html", action="store_true")
    c.add_argument("--resume", action="store_true")
    # startup blacklist (live adds go through Crawler.add_blacklist,
    # the Agent.java:221-232 runtime-op analogue)
    c.add_argument("--blacklist-host", action="append")
    c.add_argument("--blacklist-ip", type=int, action="append")
    c.set_defaults(fn=cmd_crawl)

    s = sub.add_parser("stats")
    s.add_argument("--store-dir", required=True)
    s.set_defaults(fn=cmd_stats)

    pr = sub.add_parser("process")
    pr.add_argument("--store-dir", required=True)
    pr.add_argument("--processor", default="text")
    pr.add_argument("--out")
    pr.add_argument("--preserve-order", action="store_true")
    pr.set_defaults(fn=cmd_process)

    co = sub.add_parser("corpus")
    co.add_argument("--store-dir", required=True)
    co.add_argument("--out", required=True)
    co.add_argument("--min-words", type=int, default=50)
    co.add_argument("--min-stop", type=int, default=2)
    co.set_defaults(fn=cmd_corpus)

    ex = sub.add_parser("export")
    ex.add_argument("inputs", help="glob of input parquet files")
    ex.add_argument("out")
    ex.add_argument("--shard-size", type=int, default=16)
    ex.set_defaults(fn=cmd_export)

    we = sub.add_parser("warc-export")
    we.add_argument("--store-dir", required=True)
    we.add_argument("--out", required=True)
    we.set_defaults(fn=cmd_warc_export)

    wi = sub.add_parser("warc-index")
    wi.add_argument("--path", required=True)
    wi.add_argument("--out")
    wi.set_defaults(fn=cmd_warc_index)

    wg = sub.add_parser("warc-ingest")
    wg.add_argument("--paths", nargs="+", required=True)
    wg.add_argument("--out", required=True)
    wg.set_defaults(fn=cmd_warc_ingest)

    args = p.parse_args(argv)
    args.fn(args)
    return 0


if __name__ == "__main__":
    sys.exit(main())
