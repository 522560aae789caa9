"""`mttpu_train` — train a configuration.

Parity target: nnunet/run/run_training.py:28-198 (argument surface and trainer
lifecycle: resolve configuration -> construct trainer -> initialize -> [resume]
-> run_training -> validate [-> predict next stage for the cascade]).

One CLI covers the reference's nnUNet_train / nnUNet_train_DP / nnUNet_train_DDP
trio: the SPMD trainer data-parallelizes over every visible device automatically
(run/run_training_DDP.py's --local_rank/--dbs plumbing has no TPU equivalent).
"""
from __future__ import annotations

import argparse
import os

from multitalent_tpu.cli.configuration import get_default_configuration


def main(argv=None) -> None:
    from multitalent_tpu.configuration import enable_compilation_cache
    enable_compilation_cache()
    parser = argparse.ArgumentParser(description=__doc__)
    parser.add_argument("network",
                        choices=["2d", "3d_lowres", "3d_fullres",
                                 "3d_cascade_fullres"])
    parser.add_argument("network_trainer")
    parser.add_argument("task", help="task name or id")
    parser.add_argument("fold", help="0-11 or 'all'")
    parser.add_argument("-val", "--validation_only", action="store_true")
    parser.add_argument("-c", "--continue_training", action="store_true")
    parser.add_argument("-p", default=None,
                        help="plans identifier (default: framework default)")
    parser.add_argument("--use_compressed_data", action="store_true")
    parser.add_argument("--deterministic", action="store_true")
    parser.add_argument("--npz", action="store_true",
                        help="save softmax npz during validation")
    parser.add_argument("--fp32", action="store_true",
                        help="fp32 compute instead of bf16")
    parser.add_argument("--valbest", action="store_true")
    parser.add_argument("--val_folder", default="validation_raw")
    parser.add_argument("--disable_postprocessing_on_folds", action="store_true")
    # accepted for drop-in compatibility with nnUNet_train_DP/_DDP invocations
    # (run_training_DP.py/run_training_DDP.py): the jitted step is data-parallel
    # over every visible device of the mesh, so process/GPU-count plumbing and
    # --dbs batch distribution happen automatically
    parser.add_argument("-gpus", type=int, default=None,
                        help="ignored: data parallelism spans all mesh devices")
    parser.add_argument("--dbs", action="store_true",
                        help="ignored: the global batch is always sharded "
                             "across the device mesh")
    parser.add_argument("--local_rank", type=int, default=0,
                        help="ignored: no per-process launcher on TPU")
    parser.add_argument("-pretrained_weights", default=None,
                        help="checkpoint file to import backbone weights from")
    args = parser.parse_args(argv)

    fold = args.fold if args.fold == "all" else int(args.fold)
    (plans_file, output_folder_name, dataset_directory, batch_dice, stage,
     trainer_class) = get_default_configuration(args.network, args.task,
                                                args.network_trainer, args.p)

    trainer = trainer_class(plans_file, fold, output_folder=output_folder_name,
                            dataset_directory=dataset_directory,
                            batch_dice=batch_dice, stage=stage,
                            unpack_data=not args.use_compressed_data,
                            deterministic=args.deterministic,
                            fp16=not args.fp32)
    trainer.initialize(not args.validation_only)

    if args.pretrained_weights is not None and not args.continue_training:
        from flax import serialization
        import jax
        from multitalent_tpu.training.warmup import load_pretrained_weights
        template = {"step": jax.device_get(trainer.state.step),
                    "params": jax.device_get(trainer.state.params),
                    "opt_state": jax.device_get(trainer.state.opt_state)}
        with open(args.pretrained_weights, "rb") as f:
            tree = serialization.from_bytes(template, f.read())
        trainer.state = trainer.state.replace(params=load_pretrained_weights(
            trainer.state.params, tree["params"]))
        trainer.print_to_log_file("imported pretrained backbone weights from",
                                  args.pretrained_weights)

    if not args.validation_only:
        if args.continue_training:
            trainer.load_latest_checkpoint()
        trainer.run_training()
    else:
        if args.valbest:
            trainer.load_best_checkpoint(train=False)
        else:
            trainer.load_final_checkpoint(train=False)

    trainer.network_inference_mode = True
    trainer.validate(
        save_softmax=args.npz, validation_folder_name=args.val_folder,
        run_postprocessing_on_folds=not args.disable_postprocessing_on_folds)

    if args.network == "3d_lowres":
        from multitalent_tpu.training.cascade import predict_next_stage
        trainer.load_best_checkpoint(False)
        predict_next_stage(trainer, os.path.join(
            dataset_directory,
            trainer.plans.data_identifier + f"_stage{stage + 1}"))


if __name__ == "__main__":
    main()
