"""Folder-level inference pipeline.

Parity targets: nnunet/inference/predict.py:35-601 (`predict_from_folder` /
`predict_cases`: `_0000.nii.gz` case discovery, background preprocessing feeding
the device, fold-ensemble softmax averaging, async export, `--part_id/--num_parts`
sharding, overwrite-skip resume) and predict_MultiTalent.py:131-521 (sigmoid
region inference, every region exported as its own binary NIfTI under
`output/individual/`).

TPU-native shape: preprocessing runs on host threads that prefetch ahead of the
device (the reference uses `Process`+`Queue`, predict.py:93-129); the device loop
is the jitted sliding-window engine; export is again host threads.
"""
from __future__ import annotations

import os
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from multitalent_tpu.inference.model_restore import load_model_and_checkpoint_files
from multitalent_tpu.inference.segmentation_export import (
    save_segmentation_nifti_from_softmax)
from multitalent_tpu.plans import Plans
from multitalent_tpu.registry import resolve_preprocessor
from multitalent_tpu.utils.fileops import load_pickle, maybe_mkdir, subfiles


def check_input_folder_and_return_caseIDs(input_folder: str,
                                          expected_num_modalities: int) -> list[str]:
    """Case discovery by the `_XXXX.nii.gz` convention (predict.py:567-601)."""
    files = subfiles(input_folder, suffix=".nii.gz", join=False)
    maybe_case_ids = sorted({f[:-12] for f in files})
    remaining = set(files)
    missing = []
    for c in maybe_case_ids:
        for mod in range(expected_num_modalities):
            expected = f"{c}_{mod:04d}.nii.gz"
            if expected not in remaining:
                missing.append(expected)
            else:
                remaining.discard(expected)
    assert not missing, f"missing modality files: {missing[:10]}"
    assert not remaining, f"unexpected files: {sorted(remaining)[:10]}"
    return maybe_case_ids


def _make_preprocess_fn(trainer):
    plans: Plans = trainer.plans
    stage = trainer.stage
    preprocessor_cls = resolve_preprocessor(plans.preprocessor_name)
    intensity_props = plans.dataset_properties.get("intensityproperties") \
        if plans.dataset_properties else None
    preprocessor = preprocessor_cls(
        plans.normalization_schemes,
        plans.use_mask_for_norm, plans.transpose_forward, intensity_props)
    target_spacing = plans.stage(stage).current_spacing

    def preprocess(case_files):
        data, _, properties = preprocessor.preprocess_test_case(
            case_files, target_spacing)
        return data, properties

    return preprocess


def predict_cases(model: str, list_of_lists: list[list[str]],
                  output_filenames: list[str], folds, save_npz: bool = False,
                  num_threads_preprocessing: int = 2,
                  num_threads_nifti_save: int = 2, segs_from_prev_stage=None,
                  do_tta: bool = True, overwrite_existing: bool = True,
                  all_in_gpu: bool = False, step_size: float = 0.5,
                  checkpoint_name: str = "model_final_checkpoint",
                  region_class_order=None, export_region_niftis: bool = False,
                  fast_mode: str | None = None):
    """Predict a list of cases with a fold ensemble (predict_cases parity,
    predict.py:131-292). fast_mode: None (full), "fast" (no softmax export,
    device argmax — predict_cases_fast, predict.py:294) or "fastest"
    (argmax at network grid, nearest-resampled labelmap —
    predict_cases_fastest, predict.py:442)."""
    assert fast_mode in (None, "fast", "fastest")
    assert not (fast_mode and save_npz), "fast modes never materialize softmax"
    assert len(list_of_lists) == len(output_filenames)

    if not overwrite_existing:
        keep = [i for i, o in enumerate(output_filenames)
                if not (os.path.isfile(o)
                        and (not save_npz or os.path.isfile(o[:-7] + ".npz")))]
        list_of_lists = [list_of_lists[i] for i in keep]
        output_filenames = [output_filenames[i] for i in keep]
    if not output_filenames:
        return

    trainer, all_fold_params = load_model_and_checkpoint_files(
        model, folds, checkpoint_name=checkpoint_name)
    preprocess = _make_preprocess_fn(trainer)
    if region_class_order is None:
        region_class_order = trainer.regions_class_order

    export_pool = ThreadPoolExecutor(max_workers=num_threads_nifti_save)
    preprocess_pool = ThreadPoolExecutor(max_workers=num_threads_preprocessing)
    preprocessed = preprocess_pool.map(preprocess, list_of_lists)

    predictor = trainer.get_sliding_window_predictor(do_mirroring=do_tta,
                                                     step_size=step_size)

    def run_case(preput):
        """Fold-ensemble prediction summed ON DEVICE; host fetch deferred so the
        transfer of one case overlaps the next case's compute. `preput` is a
        begin_put token: the volume ships host->device ONCE per case (not per
        fold), and the put itself was issued during the previous case's
        compute."""
        probs_sum, slicer = None, None
        for params in all_fold_params:
            probs_dev, slicer = predictor.predict_to_device(params,
                                                            preput=preput)
            probs_sum = probs_dev if probs_sum is None else probs_sum + probs_dev
        return probs_sum, slicer

    futures = []
    pending = None  # (out_fname, probs_dev, slicer, properties)

    def _device_export_applicable(properties) -> bool:
        """Resample+argmax/threshold on device and fetch only the final
        segmentation (ops/device_export.py): ~25-200x less device->host
        traffic. Host fallback when softmax must be materialized (save_npz)
        or the case needs the separate-z anisotropic resampling."""
        import os
        from multitalent_tpu.ops.device_export import can_export_on_device
        if os.environ.get("MTTPU_DEVICE_EXPORT", "1") == "0":
            return False
        if save_npz:
            return False
        return can_export_on_device(properties)

    def _flush_device_begin(probs_dev, slicer, properties):
        """Dispatch the device-export programs (resample, threshold, argmax,
        RLE encode) while the device is otherwise idle; the returned token's
        transfers then overlap the next case's compute in _flush_device_finish
        instead of queueing behind it on the (in-order) device stream."""
        import jax.numpy as jnp
        from multitalent_tpu.ops.device_export import (
            device_argmax_resample_nearest, device_resample_argmax,
            device_resample_threshold_bits, device_resample_threshold_packed)
        from multitalent_tpu.ops.sliding_window import (bits_fetch_begin,
                                                        rle_fetch_begin)
        probs_c = probs_dev[tuple(slicer) + (slice(None),)]
        # undo the planner's axis transpose on device (size_after_cropping is
        # in the original axis order, predict.py:222-235 analog)
        tb = properties.get("transpose_backward")
        if tb is not None and list(tb) != [0, 1, 2]:
            probs_c = jnp.transpose(probs_c, [int(i) for i in tb] + [3])
        out_shape = tuple(int(s) for s in properties["size_after_cropping"])
        packed_token = None
        if region_class_order is not None or export_region_niftis:
            # mean > 0.5  <=>  fold-sum > 0.5 * n_folds. Class-major
            # bit-plane transport by default (~half the bytes per run and no
            # host-side bit extraction); MTTPU_SW_BITS=0 keeps the word path
            thr = 0.5 * len(all_fold_params)
            if os.environ.get("MTTPU_SW_BITS", "1") != "0":
                packed_token = ("bits", bits_fetch_begin(
                    device_resample_threshold_bits(probs_c, out_shape,
                                                   threshold=thr)))
            else:
                packed_token = ("words", rle_fetch_begin(
                    device_resample_threshold_packed(probs_c, out_shape,
                                                     threshold=thr)))
        seg_dev = None
        if region_class_order is None:
            if fast_mode == "fastest":
                seg_dev = device_argmax_resample_nearest(probs_c, out_shape)
            else:
                # softmax model: the main labelmap is ALWAYS argmax (matching
                # the host path, save_segmentation_nifti_from_softmax with
                # region_class_order=None); the packed thresholded bits serve
                # only the per-region niftis below
                seg_dev = device_resample_argmax(probs_c, out_shape)
        return packed_token, seg_dev

    def _flush_device_finish(out_fname, properties, packed_token, seg_dev):
        from multitalent_tpu.ops.device_export import (
            segmentation_from_regions_bits, segmentation_from_regions_packed)
        from multitalent_tpu.ops.sliding_window import (bits_fetch_finish,
                                                        rle_fetch_finish)
        from multitalent_tpu.inference.segmentation_export import (
            save_segmentation_nifti)
        masks = packed = None
        if packed_token is not None:
            kind, token = packed_token
            if kind == "bits":
                masks = bits_fetch_finish(token)  # (K, Z, Y, X) bool
            else:
                packed = rle_fetch_finish(token)
        if region_class_order is not None:
            seg = (segmentation_from_regions_bits(masks, region_class_order)
                   if masks is not None else
                   segmentation_from_regions_packed(packed,
                                                    region_class_order))
        else:
            seg = np.asarray(seg_dev)
        maybe_mkdir(os.path.dirname(out_fname) or ".")
        futures.append(export_pool.submit(
            save_segmentation_nifti, seg.astype(np.float32), out_fname,
            properties))
        if export_region_niftis and (masks is not None or packed is not None):
            from multitalent_tpu.tasks.multitalent import REGIONS
            individual = maybe_mkdir(os.path.join(
                os.path.dirname(out_fname), "individual"))
            case_id = os.path.basename(out_fname)[:-7]
            for i, r in enumerate(REGIONS):
                mask = (masks[i] if masks is not None else
                        ((packed[..., i // 32] >> np.uint32(i % 32)) & 1))
                rdir = maybe_mkdir(os.path.join(individual, r))
                futures.append(export_pool.submit(
                    save_segmentation_nifti, mask.astype(np.float32),
                    os.path.join(rdir, case_id + ".nii.gz"), dict(properties)))

    def flush_begin(pending):
        out_fname, probs_dev, slicer, properties = pending
        if _device_export_applicable(properties):
            return _flush_device_begin(probs_dev, slicer, properties)
        return None

    def flush_finish(pending, token):
        out_fname, probs_dev, slicer, properties = pending
        if token is not None:
            _flush_device_finish(out_fname, properties, *token)
            return
        probs_mean = predictor.fetch(probs_dev, slicer) / len(all_fold_params)
        _export(out_fname, probs_mean, properties)

    def _export(out_fname, probs_mean, properties):
        npz_fname = out_fname[:-7] + ".npz" if save_npz else None
        maybe_mkdir(os.path.dirname(out_fname) or ".")
        futures.append(export_pool.submit(
            save_segmentation_nifti_from_softmax, probs_mean, out_fname,
            properties, 1, region_class_order, None, None, npz_fname, None,
            None, 0))
        if export_region_niftis:
            from multitalent_tpu.tasks.multitalent import REGIONS
            individual = maybe_mkdir(os.path.join(
                os.path.dirname(out_fname), "individual"))
            case_id = os.path.basename(out_fname)[:-7]
            for r, ch in zip(REGIONS, range(probs_mean.shape[0])):
                rdir = maybe_mkdir(os.path.join(individual, r))
                futures.append(export_pool.submit(
                    save_segmentation_nifti_from_softmax, probs_mean[ch][None],
                    os.path.join(rdir, case_id + ".nii.gz"), dict(properties),
                    1, ((1,),)))

    cases = zip(output_filenames, preprocessed)
    nxt = next(cases, None)
    next_put = predictor.begin_put(nxt[1][0]) if nxt is not None else None
    while nxt is not None:
        out_fname, (data, properties) = nxt
        cur_put = next_put
        # pipeline: enqueue the PREVIOUS case's export programs first (device
        # is idle here), dispatch this case's compute, issue the NEXT case's
        # host->device put (streams while this case computes), then fetch +
        # write the previous case's outputs while this case computes
        token = flush_begin(pending) if pending is not None else None
        probs_dev, slicer = run_case(cur_put)
        nxt = next(cases, None)
        next_put = predictor.begin_put(nxt[1][0]) if nxt is not None else None
        if pending is not None:
            flush_finish(pending, token)
        pending = (out_fname, probs_dev, slicer, properties)
    if pending is not None:
        flush_finish(pending, flush_begin(pending))

    for f in futures:
        f.result()
    export_pool.shutdown()
    preprocess_pool.shutdown()


def predict_cases_fast(model, list_of_lists, output_filenames, folds,
                       num_threads_preprocessing: int = 2,
                       num_threads_nifti_save: int = 2, do_tta: bool = True,
                       overwrite_existing: bool = False, step_size: float = 0.5,
                       checkpoint_name: str = "model_final_checkpoint"):
    """predict_cases_fast parity (predict.py:294-440): no softmax is ever
    materialized — fold-summed probabilities argmax straight to a labelmap
    (here: resampled + argmaxed on device, only uint8 labels cross the link)."""
    return predict_cases(model, list_of_lists, output_filenames, folds,
                         save_npz=False,
                         num_threads_preprocessing=num_threads_preprocessing,
                         num_threads_nifti_save=num_threads_nifti_save,
                         do_tta=do_tta, overwrite_existing=overwrite_existing,
                         step_size=step_size, checkpoint_name=checkpoint_name,
                         fast_mode="fast")


def predict_cases_fastest(model, list_of_lists, output_filenames, folds,
                          num_threads_preprocessing: int = 2,
                          num_threads_nifti_save: int = 2, do_tta: bool = True,
                          overwrite_existing: bool = False,
                          step_size: float = 0.5,
                          checkpoint_name: str = "model_final_checkpoint"):
    """predict_cases_fastest parity (predict.py:442-565): argmax at the
    network grid, then nearest-resample the single labelmap."""
    return predict_cases(model, list_of_lists, output_filenames, folds,
                         save_npz=False,
                         num_threads_preprocessing=num_threads_preprocessing,
                         num_threads_nifti_save=num_threads_nifti_save,
                         do_tta=do_tta, overwrite_existing=overwrite_existing,
                         step_size=step_size, checkpoint_name=checkpoint_name,
                         fast_mode="fastest")


def predict_from_folder(model: str, input_folder: str, output_folder: str, folds,
                        save_npz: bool = False, num_threads_preprocessing: int = 2,
                        num_threads_nifti_save: int = 2,
                        lowres_segmentations=None, part_id: int = 0,
                        num_parts: int = 1, tta: bool = True,
                        overwrite_existing: bool = True, all_in_gpu: bool = False,
                        step_size: float = 0.5,
                        checkpoint_name: str = "model_final_checkpoint",
                        multitalent_regions: bool = False,
                        mode: str = "normal"):
    """predict_from_folder parity (predict.py:603): case discovery, embarrassingly
    parallel `part_id::num_parts` sharding, plans-driven modality count."""
    maybe_mkdir(output_folder)
    import shutil
    shutil.copy(os.path.join(model, "plans.pkl"), output_folder) \
        if os.path.isfile(os.path.join(model, "plans.pkl")) else None

    expected_num_modalities = _expected_modalities(model)
    case_ids = check_input_folder_and_return_caseIDs(input_folder,
                                                     expected_num_modalities)
    output_files = [os.path.join(output_folder, c + ".nii.gz") for c in case_ids]
    all_files = subfiles(input_folder, suffix=".nii.gz", join=False)
    list_of_lists = [
        [os.path.join(input_folder, f) for f in all_files
         if f.startswith(c + "_") and len(f) == len(c) + 12]
        for c in case_ids
    ]
    assert mode in ("normal", "fast", "fastest")
    return predict_cases(
        model, list_of_lists[part_id::num_parts], output_files[part_id::num_parts],
        folds, save_npz, num_threads_preprocessing, num_threads_nifti_save,
        None, tta, overwrite_existing, all_in_gpu, step_size, checkpoint_name,
        export_region_niftis=multitalent_regions,
        fast_mode=None if mode == "normal" else mode)


def _expected_modalities(model_folder: str) -> int:
    plans_path = os.path.join(model_folder, "plans.pkl")
    if os.path.isfile(plans_path):
        return int(load_pickle(plans_path)["num_modalities"])
    # fall back to the first fold's checkpoint metadata
    from multitalent_tpu.inference.model_restore import restore_model  # noqa: F401
    return 1


def ensemble_predictions(folders: list[str], output_folder: str,
                         regions_class_order=None, num_threads: int = 2) -> None:
    """Average saved softmax npz across model folders and re-export
    (inference/ensemble_predictions.py:26-98)."""
    maybe_mkdir(output_folder)
    patient_ids = [set(os.path.basename(p)[:-4]
                       for p in subfiles(f, suffix=".npz")) for f in folders]
    common = sorted(set.intersection(*patient_ids))
    assert common, "no common cases across folders"
    pool = ThreadPoolExecutor(max_workers=num_threads)
    futures = []
    for pid in common:
        def run(pid=pid):
            probs = None
            properties = None
            for f in folders:
                npz = np.load(os.path.join(f, pid + ".npz"))["softmax"].astype(
                    np.float32)
                probs = npz if probs is None else probs + npz
                if properties is None:
                    properties = load_pickle(os.path.join(f, pid + ".pkl"))
            probs /= len(folders)
            # npz softmax is already on the cropped grid: export without resampling
            props = dict(properties)
            props["size_after_cropping"] = probs.shape[1:]
            save_segmentation_nifti_from_softmax(
                probs, os.path.join(output_folder, pid + ".nii.gz"), props, 1,
                regions_class_order)
        futures.append(pool.submit(run))
    for f in futures:
        f.result()
    pool.shutdown()
