"""Golden-result verification for quick-schedule regression configs.

Parity target: detectron2's verify_results / print_csv_format
(detectron2/detectron2/evaluation/testing.py), driven by
``TEST.EXPECTED_RESULTS`` entries ``[task, metric, expected, tolerance]``
(the reference's quick_schedules ``*_inference_acc_test.yaml`` pattern,
SURVEY.md §4) and called from the train drivers after evaluation.
"""
from __future__ import annotations

import logging
import pprint
from typing import Dict, Mapping

logger = logging.getLogger(__name__)


def flatten_results_dict(results: Mapping) -> Dict[str, float]:
    """{'bbox': {'AP50': x}} -> {'bbox/AP50': x} (d2 flatten_results_dict)."""
    out: Dict[str, float] = {}
    for k, v in results.items():
        if isinstance(v, Mapping):
            for kk, vv in flatten_results_dict(v).items():
                out[f"{k}/{kk}"] = vv
        else:
            out[str(k)] = v
    return out


def verify_results(cfg, results: Mapping) -> bool:
    """Check evaluation results against cfg.TEST.EXPECTED_RESULTS.

    Each entry is [task, metric, expected, tolerance]; passes when
    |actual - expected| < tolerance. Returns True (and logs) on success,
    raises AssertionError listing every failure otherwise — matching the
    reference's behavior that fails CI quick-schedule runs."""
    expected = cfg.TEST.EXPECTED_RESULTS
    if not expected:
        return True
    failures = []
    for task, metric, expected_val, tolerance in expected:
        actual = results[task]
        for part in str(metric).split("/"):
            actual = actual[part]
        ok = abs(float(actual) - float(expected_val)) < float(tolerance)
        logger.info("%s/%s: actual=%.4f expected=%.4f +/- %.4f -> %s",
                    task, metric, float(actual), float(expected_val),
                    float(tolerance), "OK" if ok else "FAIL")
        if not ok:
            failures.append((task, metric, float(actual), float(expected_val),
                             float(tolerance)))
    if failures:
        raise AssertionError(
            "Result verification failed:\n" + pprint.pformat(failures)
            + "\nFull results:\n" + pprint.pformat(dict(results)))
    return True
