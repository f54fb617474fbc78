"""The chip-equivalence harness must actually FAIL on a broken kernel
(VERDICT r2 item 5 'done when'): check() flags out-of-tolerance results
and run_all reports them — validated here CPU-side so the guarantee
does not depend on hand-running a sabotaged kernel on the chip."""

import importlib.util
import os

import numpy as np

_PATH = os.path.join(os.path.dirname(__file__), "..", "benchmarks",
                     "chip_equivalence.py")
spec = importlib.util.spec_from_file_location("chip_equivalence", _PATH)
chip_equivalence = importlib.util.module_from_spec(spec)
spec.loader.exec_module(chip_equivalence)


def test_check_flags_broken_kernel(capsys):
    chip_equivalence.FAILED.clear()
    chip_equivalence.RESULTS.clear()
    ref = np.ones((4, 4), np.float32)
    chip_equivalence.check("ok_kernel", ref * 1.001, ref, tol=0.02)
    chip_equivalence.check("broken_kernel", ref * 1.5, ref, tol=0.02)
    assert chip_equivalence.FAILED == ["broken_kernel"]
    assert chip_equivalence.RESULTS["ok_kernel"]["pass"]
    assert not chip_equivalence.RESULTS["broken_kernel"]["pass"]


def test_bench_merge_chipeq_never_shrinks(tmp_path):
    """bench.py's CHIPEQ merge: a budget-trimmed run must carry forward
    the last green result for kernels it skipped (round 4 shrank the
    committed file 15 kernels -> 3 by overwriting), while re-run kernels
    always take the fresh value and failures are never masked."""
    import importlib.util as ilu
    import json
    import os

    bench_path = os.path.join(os.path.dirname(__file__), "..", "bench.py")
    spec = ilu.spec_from_file_location("bench_mod", bench_path)
    bench = ilu.module_from_spec(spec)
    spec.loader.exec_module(bench)

    path = str(tmp_path / "CHIPEQ.json")
    prev = {"pass": True, "failed": [], "skipped": [],
            "results": {
                "kern_a": {"max_diff": 0.001, "pass": True},
                "kern_b": {"max_diff": 0.002, "pass": True},
                "kern_bad": {"max_diff": 9.0, "pass": False}}}
    with open(path, "w") as f:
        json.dump(prev, f)

    new = {"pass": True, "failed": [], "skipped": ["sec2"],
           "results": {"kern_a": {"max_diff": 0.003, "pass": True}}}
    merged = bench._merge_chipeq(path, new)
    # fresh result wins for the re-run kernel
    assert merged["results"]["kern_a"]["max_diff"] == 0.003
    assert "run_at" in merged["results"]["kern_a"]
    # skipped-but-previously-green kernel carried forward, marked
    assert merged["results"]["kern_b"]["carried_forward"]
    # a previously-FAILING kernel is never resurrected as evidence
    assert "kern_bad" not in merged["results"]
    assert merged["carried_forward"] == ["kern_b"]
    # pass still reflects only the new run
    assert merged["pass"] is True

    # no previous file: new result returned unchanged
    merged2 = bench._merge_chipeq(str(tmp_path / "none.json"),
                                  {"pass": False, "results": {}})
    assert merged2["pass"] is False


def test_standalone_main_persists_merged_chipeq(tmp_path, monkeypatch,
                                                capsys):
    """A standalone `python benchmarks/chip_equivalence.py` run must
    write CHIPEQ.json through bench.py's merge helper (round 5): the
    committed evidence refreshes without a bench run and never shrinks."""
    import json

    path = str(tmp_path / "CHIPEQ.json")
    prev = {"pass": True, "failed": [], "skipped": [],
            "results": {"old_green": {"max_diff": 0.001, "pass": True}}}
    with open(path, "w") as f:
        json.dump(prev, f)

    fresh = {"pass": True, "failed": [], "skipped": ["late"],
             "errors": {},
             "results": {"kern_new": {"max_diff": 0.002, "pass": True}}}
    monkeypatch.setenv("SRTPU_CHIPEQ_PATH", path)
    monkeypatch.setattr(chip_equivalence, "run_all", lambda: dict(fresh))
    chip_equivalence.main()
    assert "PASS" in capsys.readouterr().out

    with open(path) as f:
        merged = json.load(f)
    assert merged["results"]["kern_new"]["max_diff"] == 0.002
    assert merged["results"]["old_green"]["carried_forward"]

    # a failing run writes the artifact AND exits nonzero
    bad = {"pass": False, "failed": ["kern_new"], "errors": {},
           "skipped": [], "results": {
               "kern_new": {"max_diff": 9.0, "pass": False}}}
    monkeypatch.setattr(chip_equivalence, "run_all", lambda: dict(bad))
    import pytest as _pytest
    with _pytest.raises(SystemExit):
        chip_equivalence.main()
    with open(path) as f:
        merged2 = json.load(f)
    assert merged2["pass"] is False
    assert merged2["results"]["kern_new"]["pass"] is False
