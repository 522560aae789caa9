"""`python -m multitalent_tpu.cli.change_trainer` — rewrite the trainer class name
stored in a checkpoint's sidecar pkl (nnunet/inference/change_trainer.py parity),
so checkpoints restore through a different (e.g. renamed) trainer class."""
from __future__ import annotations

import argparse
import pickle


def main(argv=None) -> None:
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("checkpoint_pkl", help="path to <ckpt>.pkl sidecar")
    parser.add_argument("new_trainer_name")
    args = parser.parse_args(argv)
    with open(args.checkpoint_pkl, "rb") as f:
        meta = pickle.load(f)
    old = meta.get("trainer_name")
    meta["trainer_name"] = args.new_trainer_name
    with open(args.checkpoint_pkl, "wb") as f:
        pickle.dump(meta, f)
    print(f"{args.checkpoint_pkl}: {old} -> {args.new_trainer_name}")


if __name__ == "__main__":
    main()
