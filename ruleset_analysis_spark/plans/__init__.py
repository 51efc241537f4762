from .registry import QuerySpec, all_specs, oracle_dict, queries_dict, register  # noqa: F401
