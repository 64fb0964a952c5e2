"""Algorithm dispatch by ``algorithm_name``.

Mirrors the reference's dispatch table (``trainers/evaluate.py:142-167``
/ ``trainers/test.py:58-83``).
"""

from __future__ import annotations


def get_algorithm(name: str):
    if name == "STiL":
        from stil_tta_tpu.algorithms.stil import STiL
        return STiL
    if name == "STiL_SAINT":
        from stil_tta_tpu.algorithms.stil import STiL_SAINT
        return STiL_SAINT
    if name == "SimMatch":
        from stil_tta_tpu.algorithms.simmatch import SimMatch
        return SimMatch
    if name == "CoMatch":
        from stil_tta_tpu.algorithms.comatch import CoMatch
        return CoMatch
    if name == "FreeMatch":
        from stil_tta_tpu.algorithms.freematch import FreeMatch
        return FreeMatch
    if name == "MMatch":
        from stil_tta_tpu.algorithms.mmatch import MMatch
        return MMatch
    if name == "CoTrain_Pseudo":
        from stil_tta_tpu.algorithms.cotrain import CoTrain
        return CoTrain
    if name == "CoTrain_Pseudo_SAINT":
        from stil_tta_tpu.algorithms.cotrain import CoTrainSAINT
        return CoTrainSAINT
    if name == "Supervised":
        from stil_tta_tpu.algorithms.supervised import Supervised
        return Supervised
    if name == "TabularEval":
        from stil_tta_tpu.algorithms.tabular_eval import TabularEval
        return TabularEval
    raise ValueError(f"Algorithm name not found: {name}")
