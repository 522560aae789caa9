"""`mttpu_ensemble` — average saved softmax npz of several models and re-export.

Parity target: nnunet/inference/ensemble_predictions.py:101-… CLI (nnUNet_ensemble,
setup.py:35).
"""
from __future__ import annotations

import argparse

from multitalent_tpu.inference.predict import ensemble_predictions


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-f", "--folders", nargs="+", required=True,
                        help="prediction folders containing saved .npz softmax")
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("--npz", action="store_true",
                        help="(accepted for parity; merged npz are not re-saved)")
    parser.add_argument("-t", "--threads", type=int, default=2)
    args = parser.parse_args(argv)
    ensemble_predictions(args.folders, args.output_folder,
                         num_threads=args.threads)


if __name__ == "__main__":
    main()
