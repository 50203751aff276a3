"""CLI surface tests (__main__.py): the reference's entry points (SURVEY
§3.1-3.3) driven end-to-end over the fixtures."""

from __future__ import annotations

import json
import glob
import os

from multiagent_form_schema_etl_spark.__main__ import main


def test_cli_pipeline_writes_stages_and_forms(spark, tmp_path):
    out = str(tmp_path / "out")
    rc = main(["pipeline", "--out", out,
               "--stages", "clauses,forms"])
    assert rc == 0
    assert spark.read.parquet(os.path.join(out, "clauses")).count() > 0
    [jf] = glob.glob(os.path.join(out, "forms_json", "part-*.json"))
    rows = [json.loads(line) for line in open(jf)]
    assert rows and {"doc_id", "field_name", "value"} <= set(rows[0])


def test_cli_pipeline_scoped_mode_and_form_filter(spark, tmp_path):
    out = str(tmp_path / "scoped")
    rc = main(["pipeline", "--mode", "scoped", "--form", "NDA_Form",
               "--out", out])
    assert rc == 0
    [jf] = glob.glob(os.path.join(out, "forms_json", "part-*.json"))
    rows = [json.loads(line) for line in open(jf)]
    assert rows and all(r["form_name"] == "NDA_Form" for r in rows)


def test_cli_evaluate_writes_report(spark, tmp_path):
    out = str(tmp_path / "eval")
    rc = main(["evaluate", "--out", out])
    assert rc == 0
    [jf] = glob.glob(os.path.join(out, "eval_report", "part-*.json"))
    rows = [json.loads(line) for line in open(jf)]
    assert rows and "f1" in rows[0]


def test_cli_query_runs_and_rejects_unknown(spark, capsys, tmp_path):
    assert main(["query", "q01_pricing_summary",
                 "--sf-dir", "/root/testdata/sf0.001", "--limit", "3"]) == 0
    lines = [json.loads(line)
             for line in capsys.readouterr().out.strip().splitlines()]
    assert 0 < len(lines) <= 3 and "l_returnflag" in lines[0]
    assert main(["query", "no_such_query"]) == 2


def test_cli_list_names_every_registered_query(spark, capsys):
    assert main(["list"]) == 0
    out = capsys.readouterr().out
    import __spark_entry__ as e
    assert all(name in out for name in e.queries())


def test_cli_pipeline_metrics_flag_reports_input_quality(spark, tmp_path, capsys):
    out = str(tmp_path / "metered")
    rc = main(["pipeline", "--out", out, "--stages", "forms", "--metrics"])
    assert rc == 0
    lines = [ln for ln in capsys.readouterr().out.splitlines()
             if ln.startswith("{")]
    assert lines
    m = json.loads(lines[-1])["input_metrics"]
    assert m["n_rows"] > 0
    assert "nulls_text" in m and "nulls_x0" in m and "sum_confidence" in m


def test_bench_compact_line_stays_under_tail_budget():
    """The driver captures only ~2 KB of stdout tail (BENCH_r08 lost its
    record to this); the compact line must stay under the hard budget even
    with the full current headliner set -- and degrade deterministically
    (drop per-query warm medians from the LINE only) rather than overflow
    if the set ever grows past it."""
    import bench

    names = bench.HEADLINE + bench.OPTIONAL
    run = {
        "value": 50.123, "warm_total": 20.456, "sf": 0.1,
        "queries": {n: 1.234 for n in names},
        "queries_warm": {n: 0.567 for n in names},
        "queries_collect_method": {"w1_running_revenue_per_customer": 2.5,
                                   "st_session_window": 0.9},
        "master": "local[32]", "parallelism": 32,
    }
    run_loaded = dict(run, value=92.15,
                      loadavg_before=[7.01, 5.5, 3.2],
                      loadavg_after=[6.8, 5.9, 3.5],
                      steal_pct=23.4)
    full, line = bench.build_records([run, run, run_loaded])
    assert len(line) <= bench._LINE_BUDGET
    rec = json.loads(line)
    assert rec["metric"] == "headline_queries_total_runtime"
    assert rec["n_runs"] == 3 and rec["queries"] and rec["value"] == 50.123
    assert full["runs"] and full["queries_collect_method"]
    # loadavg self-annotation (VERDICT r12 item 1): the worst 1-min sample
    # and the wall-ordered per-pass cold totals ride the compact line so a
    # contaminated record self-identifies without out-of-band disclosure
    assert rec["load_max_1m"] == 7.01
    assert rec["run_values"] == [50.123, 50.123, 92.15]
    assert rec["steal_pct_max"] == 23.4  # hypervisor-steal self-diagnosis
    # scaling-probe evidence (VERDICT r14 item 2): the record itself must
    # prove which core count the session ran with, so the driver's
    # 8-vs-32-core comparison can tell "env ignored" from
    # "overhead-dominated at this SF"
    assert rec["master"] == "local[32]" and rec["parallelism"] == 32
    assert full["runs"][2]["loadavg_before"] == [7.01, 5.5, 3.2]
    assert full["runs"][0]["loadavg_before"] == []  # tolerated when absent
    assert full["runs"][0]["steal_pct"] is None

    # a pathologically wide headliner set must shed queries_warm, not grow
    wide = dict(run)
    wide["queries"] = {f"q_{i}_{'x'*30}": 1.0 for i in range(40)}
    wide["queries_warm"] = dict(wide["queries"])
    _, wline = bench.build_records([wide])
    assert len(wline) <= bench._LINE_BUDGET
    assert "queries_warm" not in json.loads(wline)

    # and a set so wide the cold medians alone overflow must shed them
    # too (ADVICE r9 final fallback) -- the line parses unconditionally
    huge = dict(run)
    huge["queries"] = {f"q_{i}_{'y'*60}": 1.0 for i in range(60)}
    huge["queries_warm"] = dict(huge["queries"])
    _, hline = bench.build_records([huge])
    assert len(hline) <= bench._LINE_BUDGET
    hrec = json.loads(hline)
    assert "queries" not in hrec and hrec["queries_in"] == "BENCH_LOCAL.json"
    assert hrec["value"] == 50.123 and hrec["warm_total"] == 20.456
