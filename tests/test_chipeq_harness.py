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
