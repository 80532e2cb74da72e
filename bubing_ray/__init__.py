"""bubing_ray — a Ray-Data-native rebuild of BUbiNG's crawl/data engine.

Not a port: queues become ``ray.data.Dataset``s, threads become stages,
consistent-hash agent routing becomes hash partitioning, the Mercator
sieve becomes a sharded membership actor service, and the workbench's
politeness becomes keyed host-state actors emitting fetch-ready batches.
Reference (read-only, studied for semantics only): sliard/BUbiNG at
/root/reference.
"""

__version__ = "0.1.0"
