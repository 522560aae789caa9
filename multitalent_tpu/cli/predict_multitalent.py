"""`mttpu_predict_multitalent` — MultiTalent inference: all 47 region channels,
each exported as its own binary NIfTI under <output>/individual/<region>/.

Parity target: nnunet/inference/predict_MultiTalent.py:373-521 (argument surface
incl. --part_id/--num_parts sharding; the reference launches this under
torch.distributed.launch — here a single process drives the chip/mesh).
"""
from __future__ import annotations

import argparse

from multitalent_tpu.inference.predict import predict_from_folder


def main(argv=None) -> None:
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("-i", "--input_folder", required=True)
    parser.add_argument("-o", "--output_folder", required=True)
    parser.add_argument("-m", "--model_folder", required=True,
                        help="trained MultiTalent model folder (contains fold_X)")
    parser.add_argument("-f", "--folds", nargs="+", default=None)
    parser.add_argument("-z", "--save_npz", action="store_true")
    parser.add_argument("--num_threads_preprocessing", type=int, default=2)
    parser.add_argument("--num_threads_nifti_save", type=int, default=2)
    parser.add_argument("--disable_tta", action="store_true")
    parser.add_argument("--overwrite_existing", type=int, default=1)
    parser.add_argument("--part_id", type=int, default=0)
    parser.add_argument("--num_parts", type=int, default=1)
    parser.add_argument("--step_size", type=float, default=0.5)
    parser.add_argument("-chk", default="model_final_checkpoint")
    args = parser.parse_args(argv)

    folds = None
    if args.folds is not None:
        folds = [f if f == "all" else int(f) for f in args.folds]
    predict_from_folder(
        args.model_folder, args.input_folder, args.output_folder, folds,
        save_npz=args.save_npz,
        num_threads_preprocessing=args.num_threads_preprocessing,
        num_threads_nifti_save=args.num_threads_nifti_save,
        part_id=args.part_id, num_parts=args.num_parts,
        tta=not args.disable_tta,
        overwrite_existing=bool(args.overwrite_existing),
        step_size=args.step_size, checkpoint_name=args.chk,
        multitalent_regions=True)


if __name__ == "__main__":
    main()
