"""`mttpu_evaluate_folder` — evaluate predictions against ground truth.

Parity target: nnunet/evaluation/evaluator.py:446 CLI (nnUNet_evaluate_folder).
"""
from __future__ import annotations

import argparse

from multitalent_tpu.evaluation.evaluator import evaluate_folder


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-ref", required=True, help="folder with ground truth")
    parser.add_argument("-pred", required=True, help="folder with predictions")
    parser.add_argument("-l", "--labels", nargs="+", type=int, required=True)
    args = parser.parse_args(argv)
    evaluate_folder(args.ref, args.pred, args.labels)


if __name__ == "__main__":
    main()
