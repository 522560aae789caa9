"""Cross-validation inference ("validate") for trainers.

Parity targets: nnUNetTrainer.validate (nnUNetTrainer.py:526-681) — sliding-window
predict every validation case, async NIfTI export, aggregate_scores summary.json,
determine_postprocessing — and the MultiTalent variant
(MultiTalent_Trainer_DDP.validate:129-322), which additionally exports every
region channel as its own binary NIfTI and a merged labelmap per source dataset,
and evaluates per dataset against the case's valid labels.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from multitalent_tpu.data.dataset import load_case
from multitalent_tpu.inference.segmentation_export import (
    save_segmentation_nifti_from_softmax)
from multitalent_tpu.utils.fileops import (load_pickle, maybe_mkdir, save_json,
                                           subfiles)


def _export_pool(num_threads: int = 2) -> ThreadPoolExecutor:
    return ThreadPoolExecutor(max_workers=num_threads)


def run_validation(trainer, do_mirroring: bool = True, use_sliding_window: bool = True,
                   step_size: float = 0.5, save_softmax: bool = True,
                   use_gaussian: bool = True, overwrite: bool = True,
                   validation_folder_name: str = "validation_raw",
                   debug: bool = False, all_in_gpu: bool = False,
                   segmentation_export_kwargs: dict | None = None,
                   run_postprocessing_on_folds: bool = True):
    assert trainer.was_initialized, "must initialize trainer before validate()"
    output_folder = maybe_mkdir(os.path.join(trainer.output_folder,
                                             validation_folder_name))
    save_json({
        "do_mirroring": do_mirroring, "use_sliding_window": use_sliding_window,
        "step_size": step_size, "save_softmax": save_softmax,
        "use_gaussian": use_gaussian, "overwrite": overwrite,
        "validation_folder_name": validation_folder_name,
    }, os.path.join(output_folder, "validation_args.json"))

    # export resampling knobs (reference key names, nnUNetTrainer.validate:554):
    # interpolation_order / force_separate_z / interpolation_order_z
    ek = segmentation_export_kwargs or {}
    order = int(ek.get("interpolation_order", 1))
    force_sep_z = ek.get("force_separate_z", None)
    order_z = int(ek.get("interpolation_order_z", 0))

    pool = _export_pool()
    futures = []
    for k in sorted(trainer.dataset_val.keys()):
        fname = os.path.join(output_folder, k + ".nii.gz")
        if not overwrite and os.path.isfile(fname):
            continue
        case_all_data = np.array(load_case(trainer.dataset_val[k], "r"))
        data = case_all_data[:-1]
        properties = load_pickle(trainer.dataset_val[k]["properties_file"])
        _, softmax = trainer.predict_preprocessed_data_return_seg_and_softmax(
            data, do_mirroring=do_mirroring, step_size=step_size,
            use_gaussian=use_gaussian)
        npz_fname = fname[:-7] + ".npz" if save_softmax else None
        futures.append(pool.submit(
            save_segmentation_nifti_from_softmax, np.asarray(softmax), fname,
            properties, order, trainer.regions_class_order, None, None,
            npz_fname, None, force_sep_z, order_z))
    for f in futures:
        f.result()
    pool.shutdown()

    # evaluate against the ground-truth niftis shipped with the preprocessed data
    gt_folder = os.path.join(trainer.dataset_directory, "gt_segmentations")
    summary = None
    if os.path.isdir(gt_folder):
        from multitalent_tpu.evaluation.evaluator import aggregate_scores
        pred_files = subfiles(output_folder, suffix=".nii.gz", join=False)
        pairs = [(os.path.join(output_folder, f), os.path.join(gt_folder, f))
                 for f in pred_files
                 if os.path.isfile(os.path.join(gt_folder, f))]
        if pairs:
            summary = aggregate_scores(
                pairs, labels=list(trainer.classes),
                json_output_file=os.path.join(output_folder, "summary.json"),
                json_name="validation", num_threads=4)
        if run_postprocessing_on_folds and pairs:
            from multitalent_tpu.postprocessing.connected_components import (
                determine_postprocessing)
            determine_postprocessing(
                trainer.output_folder, gt_folder, validation_folder_name,
                final_subf_name=validation_folder_name + "_postprocessed",
                debug=debug)
    return summary


def run_multitalent_validation(trainer, do_mirroring: bool = True,
                               use_sliding_window: bool = True,
                               step_size: float = 0.5, save_softmax: bool = False,
                               use_gaussian: bool = True, overwrite: bool = True,
                               validation_folder_name: str = "validation_raw",
                               debug: bool = False, all_in_gpu: bool = False,
                               segmentation_export_kwargs: dict | None = None,
                               run_postprocessing_on_folds: bool = False):
    """Region-wise validation export: each of the 47 region channels individually
    (output/<region>/case.nii.gz as binary masks) plus one merged labelmap per case
    using its source dataset's regions_class_order; per-dataset evaluation with
    valid labels only (MultiTalent_Trainer_DDP.validate:129-322)."""
    from multitalent_tpu.tasks.multitalent import (REGION_OUTPUT_IDX, REGIONS,
                                                   REGIONS_CLASS_ORDER, TASK_IDS,
                                                   VALID_REGIONS)

    assert trainer.was_initialized
    output_folder = maybe_mkdir(os.path.join(trainer.output_folder,
                                             validation_folder_name))
    individual_folder = maybe_mkdir(os.path.join(output_folder, "individual"))
    pool = _export_pool()
    futures = []
    for k in sorted(trainer.dataset_val.keys()):
        merged_fname = os.path.join(output_folder, k + ".nii.gz")
        if not overwrite and os.path.isfile(merged_fname):
            continue
        case_all_data = np.array(load_case(trainer.dataset_val[k], "r"))
        data = case_all_data[:-1]
        properties = load_pickle(trainer.dataset_val[k]["properties_file"])
        _, probs = trainer.predict_preprocessed_data_return_seg_and_softmax(
            data, do_mirroring=do_mirroring, step_size=step_size,
            use_gaussian=use_gaussian)
        probs = np.asarray(probs)

        prefix = k.split("_")[0]
        task = next(t for t in TASK_IDS if t.startswith(f"Task{prefix}"))
        valid_regions = VALID_REGIONS[task]
        class_order = REGIONS_CLASS_ORDER[task]

        # merged labelmap: only this dataset's region channels, stamped in the
        # dataset's class order
        region_channels = [REGION_OUTPUT_IDX[r] for r in valid_regions]
        merged_probs = probs[region_channels]
        futures.append(pool.submit(
            save_segmentation_nifti_from_softmax, merged_probs, merged_fname,
            dict(properties), 1, tuple(class_order)))

        # each region channel individually as a binary mask — ALL 47 regions
        # per case, not only the dataset's valid ones (the reference exports
        # the full region set, MultiTalent_Trainer_DDP.validate:264-275)
        for r in REGIONS:
            rdir = maybe_mkdir(os.path.join(individual_folder, r))
            futures.append(pool.submit(
                save_segmentation_nifti_from_softmax,
                probs[REGION_OUTPUT_IDX[r]][None],
                os.path.join(rdir, k + ".nii.gz"), dict(properties), 1, ((1,),)))
    for f in futures:
        f.result()
    pool.shutdown()

    # per-dataset evaluation against gt with the dataset's global labels
    gt_folder = os.path.join(trainer.dataset_directory, "gt_segmentations")
    results = {}
    if os.path.isdir(gt_folder):
        from multitalent_tpu.evaluation.evaluator import aggregate_scores
        keys = sorted(trainer.dataset_val.keys())
        by_task: dict[str, list[str]] = {}
        for k in keys:
            by_task.setdefault(k.split("_")[0], []).append(k)
        for prefix, task_keys in by_task.items():
            task = next(t for t in TASK_IDS if t.startswith(f"Task{prefix}"))
            pairs = [(os.path.join(output_folder, k + ".nii.gz"),
                      os.path.join(gt_folder, k + ".nii.gz")) for k in task_keys
                     if os.path.isfile(os.path.join(gt_folder, k + ".nii.gz"))]
            if not pairs:
                continue
            labels = sorted({l for r in VALID_REGIONS[task]
                             for l in REGIONS[r]})
            results[task] = aggregate_scores(
                pairs, labels=labels,
                json_output_file=os.path.join(output_folder,
                                              f"summary_{task}.json"),
                json_name=f"validation_{task}", num_threads=4)
    return results


def run_cascade_validation(trainer, do_mirroring: bool = True,
                           use_sliding_window: bool = True,
                           step_size: float = 0.5, save_softmax: bool = True,
                           use_gaussian: bool = True, overwrite: bool = True,
                           validation_folder_name: str = "validation_raw",
                           debug: bool = False, all_in_gpu: bool = False,
                           segmentation_export_kwargs: dict | None = None,
                           run_postprocessing_on_folds: bool = True):
    """Cascade validate: append the one-hot previous-stage segmentation to the
    input channels before sliding-window prediction
    (nnUNetTrainerV2_CascadeFullRes.validate parity)."""
    import numpy as _np
    from multitalent_tpu.training.cascade import one_hot_prev_stage_channels

    assert trainer.was_initialized
    output_folder = maybe_mkdir(os.path.join(trainer.output_folder,
                                             validation_folder_name))
    pool = _export_pool()
    futures = []
    for k in sorted(trainer.dataset_val.keys()):
        fname = os.path.join(output_folder, k + ".nii.gz")
        if not overwrite and os.path.isfile(fname):
            continue
        case_all_data = _np.array(load_case(trainer.dataset_val[k], "r"))
        data = case_all_data[:-1]
        prev = _np.load(os.path.join(
            trainer.folder_with_preprocessed_data,
            f"{k}_segFromPrevStage.npz"))["data"][0]
        data = _np.concatenate(
            [data, one_hot_prev_stage_channels(prev, trainer.num_prev_classes)])
        properties = load_pickle(trainer.dataset_val[k]["properties_file"])
        _, softmax = trainer.predict_preprocessed_data_return_seg_and_softmax(
            data, do_mirroring=do_mirroring, step_size=step_size,
            use_gaussian=use_gaussian)
        npz_fname = fname[:-7] + ".npz" if save_softmax else None
        futures.append(pool.submit(
            save_segmentation_nifti_from_softmax, _np.asarray(softmax), fname,
            properties, 1, trainer.regions_class_order, None, None, npz_fname,
            None, None, 0))
    for f in futures:
        f.result()
    pool.shutdown()

    gt_folder = os.path.join(trainer.dataset_directory, "gt_segmentations")
    summary = None
    if os.path.isdir(gt_folder):
        from multitalent_tpu.evaluation.evaluator import aggregate_scores
        pred_files = subfiles(output_folder, suffix=".nii.gz", join=False)
        pairs = [(os.path.join(output_folder, f), os.path.join(gt_folder, f))
                 for f in pred_files
                 if os.path.isfile(os.path.join(gt_folder, f))]
        if pairs:
            summary = aggregate_scores(
                pairs, labels=list(trainer.classes),
                json_output_file=os.path.join(output_folder, "summary.json"),
                json_name="validation", num_threads=4)
        if run_postprocessing_on_folds and pairs:
            from multitalent_tpu.postprocessing.connected_components import (
                determine_postprocessing)
            determine_postprocessing(
                trainer.output_folder, gt_folder, validation_folder_name,
                final_subf_name=validation_folder_name + "_postprocessed",
                debug=debug)
    return summary
