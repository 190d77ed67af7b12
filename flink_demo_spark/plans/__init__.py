from .registry import REGISTRY, all_oracles, all_queries, bench_queries, query

__all__ = ["REGISTRY", "all_oracles", "all_queries", "bench_queries", "query"]
