"""The reference's complete workflow, end to end, on this engine:

gzipped syslog archive -> parse -> hit counts -> broadcast join against
an ASA-config-derived rule dimension -> usage report with UNUSED
verdicts -> partitioned parquet sink -> read back. One test, the whole
"a user of the reference switches to this repo" path (SURVEY.md §3.1
entry points 1-3)."""

from __future__ import annotations

import gzip

import pytest
from pyspark.sql import functions as F

from ruleset_analysis_spark.sources import asa_config, sinks, text_logs

CONFIG = """
object-group network SRV
 network-object host 10.0.1.5
 network-object host 10.0.1.9
access-list OUTSIDE_IN extended permit tcp any object-group SRV eq https
access-list OUTSIDE_IN extended permit udp any object-group SRV eq domain
access-list OUTSIDE_IN extended deny ip any any
access-list RETIRED extended permit tcp any host 10.0.9.9 eq 8443
"""


@pytest.fixture(scope="module")
def archive(tmp_path_factory):
    d = tmp_path_factory.mktemp("archive")
    # two "months" of gzipped logs, several rules hit, RETIRED never hit
    lines = []
    for i in range(200):
        dst, port, proto = ("10.0.1.5", 443, "tcp") if i % 3 else ("10.0.1.9", 53, "udp")
        lines.append(
            f"%ASA-6-106100: access-list OUTSIDE_IN permitted {proto} "
            f"outside/203.0.113.{i % 250 + 1}({40000 + i}) -> dmz/{dst}({port}) "
            f"hit-cnt 1 300-second interval [0x{i:x}, 0x0]"
        )
    for m, chunk in (("01", lines[:120]), ("02", lines[120:])):
        with gzip.open(d / f"fw-2024-{m}.log.gz", "wt") as f:
            f.write("\n".join(chunk) + "\n")
    return str(d)


def test_reference_workflow_end_to_end(spark, archive, tmp_path):
    # 1. config -> broadcastable rule dimension
    rules = asa_config.rules_dataframe(spark, CONFIG)
    # 2. archived gzipped syslog -> typed hit records (JVM regex)
    hits = text_logs.parse_asa_hits(text_logs.read_log_lines(spark, archive))
    assert hits.count() == 200

    # 3. hit counts joined to rules: acl + protocol + port-range +
    #    CIDR containment of the destination (JVM expression, no UDF)
    from ruleset_analysis_spark.functions.net import ip_in_cidr

    joined = hits.join(
        F.broadcast(rules),
        (hits.acl == rules.acl)
        & ((hits.protocol == rules.protocol) | (rules.protocol == "ip"))
        & (hits.dst_port >= rules.port_lo)
        & (hits.dst_port <= rules.port_hi)
        & ip_in_cidr(hits.dst_ip, rules.dst_net),
    )
    per_rule = (
        joined.groupBy(rules.acl.alias("acl"), "rule_id")
        .agg(F.sum("hit_cnt").alias("hits"), F.countDistinct("src_ip").alias("talkers"))
    )
    got = {(r["acl"], r["rule_id"]): r["hits"] for r in per_rule.collect()}
    # rule 1 (tcp/https): lines with i%3 != 0; rule 2 (udp/domain): the rest
    tcp = sum(1 for i in range(200) if i % 3)
    udp = 200 - tcp
    assert got[("OUTSIDE_IN", 1)] == tcp
    assert got[("OUTSIDE_IN", 2)] == udp

    # 4. full usage report incl. zero-hit rules (left join + verdict)
    report = (
        rules.select("acl", "rule_id").distinct()
        .join(per_rule, ["acl", "rule_id"], "left")
        .select(
            "acl",
            "rule_id",
            F.coalesce("hits", F.lit(0)).alias("hits"),
            F.when(F.col("hits").isNull(), "UNUSED").otherwise("ACTIVE").alias("status"),
        )
    )
    unused = {(r["acl"], r["rule_id"]) for r in report.filter("status = 'UNUSED'").collect()}
    assert unused == {("RETIRED", 1)}

    # 5. sink -> partitioned parquet -> read back intact
    out = str(tmp_path / "report")
    sinks.write_parquet(report, out, partition_by=["status"])
    back = spark.read.parquet(out)
    assert back.count() == report.count()
    assert {r["status"] for r in back.select("status").distinct().collect()} == {
        "ACTIVE",
        "UNUSED",
    }


def test_run_ruleset_analysis_single_call(spark, archive):
    """The one-function composition (pipeline.run_ruleset_analysis):
    .gz dir + raw config text in, full usage report out — with
    FIRST-MATCH-WINS attribution: every flow here matches the trailing
    'deny ip any any' too, but the firewall (and the report) charges
    only the first matching rule, so the catch-all shows ZERO hits."""
    from ruleset_analysis_spark.pipeline import run_ruleset_analysis

    report = run_ruleset_analysis(spark, archive, CONFIG)
    rows = {(r["acl"], r["rule_id"]): r for r in report.collect()}
    # every configured statement appears exactly once
    assert set(rows) == {
        ("OUTSIDE_IN", 1), ("OUTSIDE_IN", 2), ("OUTSIDE_IN", 3), ("RETIRED", 1)
    }
    tcp = sum(1 for i in range(200) if i % 3)
    assert rows[("OUTSIDE_IN", 1)]["hits"] == tcp
    assert rows[("OUTSIDE_IN", 1)]["action"] == "permit"
    assert rows[("OUTSIDE_IN", 2)]["hits"] == 200 - tcp
    # first-match-wins: catch-all deny never charged
    assert rows[("OUTSIDE_IN", 3)]["hits"] == 0
    assert rows[("OUTSIDE_IN", 3)]["status"] == "UNUSED"
    assert rows[("RETIRED", 1)]["status"] == "UNUSED"
    # distinct talkers survive the flow pre-aggregation
    assert rows[("OUTSIDE_IN", 1)]["n_sources"] > 1


def test_run_ruleset_analysis_tolerates_dirty_lines(spark, tmp_path):
    """Non-106100 lines, truncated records, and malformed IPs must be
    quarantined (dropped), never abort the job or misattribute hits."""
    import gzip as _gzip

    from ruleset_analysis_spark.pipeline import run_ruleset_analysis

    d = tmp_path / "logs"
    d.mkdir()
    lines = [
        "%ASA-6-302013: Built inbound TCP connection 12345",  # other msg id
        "%ASA-6-106100: access-list OUTSIDE_IN permitted tcp "
        "outside/203.0.113.7(40000) -> dmz/10.0.1.5(443) hit-cnt 3 "
        "300-second interval [0x1, 0x0]",
        "%ASA-6-106100: access-list OUTSIDE_IN permitted tcp truncated gibberish",
        "%ASA-6-106100: access-list OUTSIDE_IN permitted tcp "
        "outside/999.1.2.3(40001) -> dmz/10.0.1.5(443) hit-cnt 2 "
        "300-second interval [0x2, 0x0]",  # malformed src ip: parses, never CIDR-matches
        "",
    ]
    with _gzip.open(d / "fw.log.gz", "wt") as f:
        f.write("\n".join(lines) + "\n")
    report = run_ruleset_analysis(spark, str(d), CONFIG)
    rows = {(r["acl"], r["rule_id"]): r for r in report.collect()}
    assert rows[("OUTSIDE_IN", 1)]["hits"] == 3  # only the clean line counts


def test_pipeline_cli_main(spark, archive, tmp_path):
    """The CLI entrypoint (run_analysis.sh analog): args in, partitioned
    parquet out, per-status summary printed. Reuses the test session
    via getOrCreate."""
    from ruleset_analysis_spark.pipeline import main

    cfg = tmp_path / "asa.cfg"
    cfg.write_text(CONFIG)
    out = str(tmp_path / "report_out")
    assert main([archive, str(cfg), out]) == 0
    back = spark.read.parquet(out)
    assert back.count() == 4  # 3 OUTSIDE_IN stmts + RETIRED
    assert {r["status"] for r in back.collect()} == {"ACTIVE", "UNUSED"}


def test_curation_pipeline_composes(spark):
    """The one-call curation pipeline: attrition rows chain (each
    stage's n_out is the next stage's n_in), survivors match the final
    count, benchmark-slice docs never survive, exact-duplicate texts
    keep only their lowest id, and the whole run is deterministic."""
    from ruleset_analysis_spark.curation_pipeline import run_curation_pipeline

    sf_dir = "/root/testdata/sf0.001"
    survivors, attrition = run_curation_pipeline(spark, sf_dir)
    rows = {r["stage"]: r for r in attrition.collect()}
    order = ["quality_gate", "exact_dedup", "near_dedup_clusters",
             "decontamination"]
    assert list(rows) == order or set(rows) == set(order)
    for a, b in zip(order, order[1:]):
        assert rows[a]["n_out"] == rows[b]["n_in"]
        assert rows[a]["n_dropped"] == rows[a]["n_in"] - rows[a]["n_out"] >= 0

    ids = [r["doc_id"] for r in survivors.collect()]
    assert len(ids) == rows["decontamination"]["n_out"] > 0
    assert len(set(ids)) == len(ids)
    # benchmark slice is quarantined
    assert not [i for i in ids if i % 97 == 0]

    # exact duplicates: for every surviving text, no lower-id doc with
    # identical text may exist in the corpus
    docs = spark.read.parquet(f"{sf_dir}/documents.parquet")
    surv = docs.filter(F.col("doc_id").isin(ids)).select("doc_id", "text")
    lower_dup = (
        surv.alias("s")
        .join(
            docs.alias("d"),
            (F.col("d.text") == F.col("s.text"))
            & (F.col("d.doc_id") < F.col("s.doc_id")),
        )
        .count()
    )
    assert lower_dup == 0

    ids2 = [r["doc_id"] for r in run_curation_pipeline(spark, sf_dir)[0].collect()]
    assert sorted(ids) == sorted(ids2)
