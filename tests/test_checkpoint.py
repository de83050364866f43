"""Checkpoint/resume: kill-after-iteration-k → resume → identical final
scores (north rule), manifest lineage gating, crash consistency."""

import glob
import json
import os

import pytest

from graphina_spark.operators.pagerank import pagerank
from graphina_spark.plans.checkpoint import CheckpointManager
from graphina_spark.sources.derived import web_graph

PARAMS = {"alg": "pagerank", "damping": 0.85, "iters": 8}


def _pr(df):
    return {r["id"]: r["rank"] for r in df.collect()}


def test_resume_matches_uninterrupted(spark, sf_dir, tmp_path):
    g = web_graph(spark, sf_dir)
    full = _pr(pagerank(g, fixed_iters=8, tol=None))

    ck = CheckpointManager(base=str(tmp_path), run_id="runA", params=PARAMS)
    # "crash" after 4 supersteps
    pagerank(g, fixed_iters=4, tol=None, checkpoint=ck)
    # resume and finish to 8
    resumed = _pr(pagerank(g, fixed_iters=8, tol=None, checkpoint=ck, resume=True))
    assert resumed.keys() == full.keys()
    assert all(abs(resumed[k] - full[k]) < 1e-12 for k in full)

    # manifests recorded per iteration with lineage + partition metrics
    manifests = sorted(glob.glob(os.path.join(str(tmp_path), "runA", "manifest-*.json")))
    assert len(manifests) == 8
    m = json.load(open(manifests[-1]))
    assert m["iteration"] == 7
    assert m["lineage"] == ck.lineage_hash()
    assert m["rows"] == g.num_vertices()
    assert len(m["partitions"]) >= 1
    assert m["parent_iteration"] == 6


def test_resume_ignores_other_params(spark, sf_dir, tmp_path):
    g = web_graph(spark, sf_dir)
    ck1 = CheckpointManager(base=str(tmp_path), run_id="runB", params={"damping": 0.85})
    pagerank(g, fixed_iters=2, tol=None, checkpoint=ck1)
    # same run dir, different params → lineage mismatch → fresh start
    ck2 = CheckpointManager(base=str(tmp_path), run_id="runB", params={"damping": 0.5})
    assert ck2.latest(spark) is None
    found = ck1.latest(spark)
    assert found is not None and found[0] == 1


def test_crash_consistency_missing_manifest(spark, sf_dir, tmp_path):
    """An iteration whose manifest was never written (crash mid-commit) is
    invisible to resume."""
    g = web_graph(spark, sf_dir)
    ck = CheckpointManager(base=str(tmp_path), run_id="runC", params=PARAMS)
    pagerank(g, fixed_iters=3, tol=None, checkpoint=ck)
    os.remove(os.path.join(ck.run_dir, "manifest-00002.json"))
    it, df, manifest = ck.latest(spark)
    assert it == 1
    assert df.count() == g.num_vertices()
    assert manifest["iteration"] == 1


def test_convergence_deltas_recorded(spark, sf_dir, tmp_path):
    g = web_graph(spark, sf_dir)
    ck = CheckpointManager(base=str(tmp_path), run_id="runD", params={"x": 1})
    pagerank(g, tol=1e-3, max_iter=50, checkpoint=ck)
    manifests = sorted(glob.glob(os.path.join(str(tmp_path), "runD", "manifest-*.json")))
    deltas = [json.load(open(p))["delta"] for p in manifests]
    assert all(d is not None for d in deltas)
    assert deltas[-1] < 1e-3  # run stopped because tolerance was hit
    assert deltas == sorted(deltas, reverse=True)  # monotone decreasing here
