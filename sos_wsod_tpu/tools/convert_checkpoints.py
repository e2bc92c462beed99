"""Teacher/student checkpoint surgery (ensemble <-> plain model).

Parity targets: tools/convert2detectron2.py (extract the modelTeacher /
modelStudent half of an ensemble checkpoint into a plain model checkpoint) and
tools/convert2unbias.py (duplicate a plain model into both roles). Our
checkpoints are orbax param pytrees: the ensemble layout is
{'params' (student), 'teacher_params', ...}; a plain layout is {'params', ...}.
Same CLI contracts, same role names.
"""
from __future__ import annotations

import argparse


def convert2detectron2(source_path: str, target_path: str, mode: str = "teacher"):
    """Extract one role from an ensemble checkpoint -> plain {'params': ...}."""
    from ..engine.checkpoint import Checkpointer
    import os

    src = Checkpointer(os.path.dirname(source_path) or ".")
    state = src.load(source_path)
    key = "teacher_params" if mode == "teacher" else "params"
    assert key in state, f"checkpoint has no '{key}' (keys: {list(state)})"
    out_dir = os.path.dirname(target_path) or "."
    tgt = Checkpointer(out_dir)
    tgt.save(os.path.basename(target_path), {"params": state[key]})


def convert2unbias(source_path: str, target_path: str):
    """Duplicate a plain model into student + teacher roles."""
    import jax
    import os

    from ..engine.checkpoint import Checkpointer

    src = Checkpointer(os.path.dirname(source_path) or ".")
    state = src.load(source_path)
    params = state.get("params", state)
    tgt = Checkpointer(os.path.dirname(target_path) or ".")
    tgt.save(
        os.path.basename(target_path),
        {
            "params": params,
            "teacher_params": jax.tree_util.tree_map(lambda x: x.copy(), params),
        },
    )


def main_convert2detectron2(argv=None):
    p = argparse.ArgumentParser(description="convert the unbiased model to a plain model.")
    p.add_argument("source_path")
    p.add_argument("target_path")
    p.add_argument("--mode", "-m", choices=["teacher", "student"], default="teacher")
    a = p.parse_args(argv)
    convert2detectron2(a.source_path, a.target_path, a.mode)


def main_convert2unbias(argv=None):
    p = argparse.ArgumentParser(description="convert a plain model to the ensemble layout.")
    p.add_argument("source_path")
    p.add_argument("target_path")
    a = p.parse_args(argv)
    convert2unbias(a.source_path, a.target_path)


if __name__ == "__main__":
    import sys

    if sys.argv[0].endswith("convert2unbias.py"):
        main_convert2unbias()
    else:
        main_convert2detectron2()
