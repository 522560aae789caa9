"""Converters producing the MultiTalent source tasks in nnU-Net raw layout.

The 13-dataset Task100 merge (tasks/convert_task100.py) presupposes its source
tasks already exist under nnUNet_raw_data. This module builds them from the
public challenge downloads, matching the reference's one-off scripts:

- Task017 AbdominalOrganSegmentation — BTCV abdomen
  (nnunet/dataset_conversion/Task017_BeyondCranialVaultAbdominalOrganSegmentation.py:23-104)
- Task018 PelvicOrganSegmentation — BTCV cervix
  (Task018_PelvicOrganSegmentation.py:22-96)
- Task055 SegTHOR (Task055_SegTHOR.py:38-108)
- Task062 NIHPancreas — TCIA Pancreas-CT
  (Task062_NIHPancreas.py:33-120; the reference first converts DICOM series
  with dicom2nifti, which is not in this image — pass the folder of
  already-converted `PANCREAS_XXXX.nii.gz` volumes; the RAS reorientation and
  the 4-case exclusion list are reproduced here)
- Task064 KiTS_labelsFixed (Task064_KiTS_labelsFixed.py:20-95)

The six Decathlon sources (Task003/006/007/008/009/010) convert through
`mttpu_convert_decathlon_task` (cli/convert_decathlon_task.py). Task046
(AbdOrgSegm2) and Task051 (StructSeg Thoracic OAR) have NO converter in the
reference either — their raw folders were assembled by hand; this rebuild
matches that (document-and-defer).

CLI: python -m multitalent_tpu.cli.convert_multitalent_sources <task> <src> ...
"""
from __future__ import annotations

import os
import shutil

from multitalent_tpu import paths
from multitalent_tpu.utils.dataset_json import generate_dataset_json
from multitalent_tpu.utils.fileops import maybe_mkdir, subdirs, subfiles


def _task_layout(task_folder_name: str, raw_data_base: str | None):
    out_base = os.path.join(raw_data_base or paths.nnUNet_raw_data(),
                            task_folder_name)
    imagestr = maybe_mkdir(os.path.join(out_base, "imagesTr"))
    imagests = maybe_mkdir(os.path.join(out_base, "imagesTs"))
    labelstr = maybe_mkdir(os.path.join(out_base, "labelsTr"))
    return out_base, imagestr, imagests, labelstr


def convert_task017_btcv_abdomen(source_dir: str,
                                 raw_data_base: str | None = None) -> str:
    """BTCV 'Multi-Atlas Labeling Beyond the Cranial Vault' RawData folder
    (Training/img, Training/label, Test/img; files img0001.nii.gz /
    label0001.nii.gz) -> Task017 with cases ABD_001 etc."""
    out_base, imagestr, imagests, labelstr = _task_layout(
        "Task017_AbdominalOrganSegmentation", raw_data_base)
    for p in subfiles(os.path.join(source_dir, "Training", "img"),
                      join=False, suffix="nii.gz"):
        name = f"ABD_{int(p[3:7]):03d}"
        shutil.copy(os.path.join(source_dir, "Training", "img", p),
                    os.path.join(imagestr, f"{name}_0000.nii.gz"))
        shutil.copy(os.path.join(source_dir, "Training", "label", "label" + p[3:]),
                    os.path.join(labelstr, f"{name}.nii.gz"))
    test_dir = os.path.join(source_dir, "Test", "img")
    if os.path.isdir(test_dir):
        for p in subfiles(test_dir, join=False, suffix=".nii.gz"):
            name = f"ABD_{int(p[3:7]):03d}"
            shutil.copy(os.path.join(test_dir, p),
                        os.path.join(imagests, f"{name}_0000.nii.gz"))
    generate_dataset_json(
        os.path.join(out_base, "dataset.json"), imagestr, imagests, ("CT",),
        {0: "background", 1: "spleen", 2: "right kidney", 3: "left kidney",
         4: "gallbladder", 5: "esophagus", 6: "liver", 7: "stomach", 8: "aorta",
         9: "inferior vena cava", 10: "portal vein and splenic vein",
         11: "pancreas", 12: "right adrenal gland", 13: "left adrenal gland"},
        "AbdominalOrganSegmentation",
        dataset_reference="https://www.synapse.org/#!Synapse:syn3193805/wiki/217789",
        dataset_description="Multi-Atlas Labeling Beyond the Cranial Vault "
                            "Abdominal Organ Segmentation")
    return out_base


def convert_task018_btcv_cervix(source_dir: str,
                                raw_data_base: str | None = None) -> str:
    """BTCV cervix RawData folder (Training/img with *-Image.nii.gz,
    Training/label with *-Mask.nii.gz, Testing/img) -> Task018."""
    out_base, imagestr, imagests, labelstr = _task_layout(
        "Task018_PelvicOrganSegmentation", raw_data_base)
    for p in subfiles(os.path.join(source_dir, "Training", "img"),
                      join=False, suffix="nii.gz"):
        shutil.copy(os.path.join(source_dir, "Training", "img", p),
                    os.path.join(imagestr, p[:-7] + "_0000.nii.gz"))
        # ...-Image.nii.gz pairs with ...-Mask.nii.gz; label keeps the image name
        shutil.copy(os.path.join(source_dir, "Training", "label",
                                 p[:-13] + "-Mask.nii.gz"),
                    os.path.join(labelstr, p))
    test_dir = os.path.join(source_dir, "Testing", "img")
    if os.path.isdir(test_dir):
        for p in subfiles(test_dir, join=False, suffix=".nii.gz"):
            shutil.copy(os.path.join(test_dir, p),
                        os.path.join(imagests, p[:-7] + "_0000.nii.gz"))
    generate_dataset_json(
        os.path.join(out_base, "dataset.json"), imagestr, imagests, ("CT",),
        {0: "background", 1: "bladder", 2: "uterus", 3: "rectum",
         4: "small bowel"},
        "PelvicOrganSegmentation",
        dataset_reference="https://www.synapse.org/#!Synapse:syn3193805/wiki/217789")
    return out_base


def convert_task055_segthor(source_dir: str,
                            raw_data_base: str | None = None) -> str:
    """SegTHOR download (train/Patient_XX/{Patient_XX.nii.gz, GT.nii.gz},
    test/*.nii.gz) -> Task055."""
    out_base, imagestr, imagests, labelstr = _task_layout(
        "Task055_SegTHOR", raw_data_base)
    for p in subdirs(os.path.join(source_dir, "train"), join=False):
        curr = os.path.join(source_dir, "train", p)
        shutil.copy(os.path.join(curr, p + ".nii.gz"),
                    os.path.join(imagestr, p + "_0000.nii.gz"))
        shutil.copy(os.path.join(curr, "GT.nii.gz"),
                    os.path.join(labelstr, p + ".nii.gz"))
    test_dir = os.path.join(source_dir, "test")
    if os.path.isdir(test_dir):
        for p in subfiles(test_dir, join=False, suffix=".nii.gz"):
            shutil.copy(os.path.join(test_dir, p),
                        os.path.join(imagests, p[:-7] + "_0000.nii.gz"))
    generate_dataset_json(
        os.path.join(out_base, "dataset.json"), imagestr, imagests, ("CT",),
        {0: "background", 1: "esophagus", 2: "heart", 3: "trachea", 4: "aorta"},
        "SegTHOR")
    return out_base


# cases the reference excludes: corrupt/mismatched label pairs
# (Task062_NIHPancreas.py:93)
TASK062_EXCLUDED = ("PANCREAS_0045", "PANCREAS_0007", "PANCREAS_0032",
                    "PANCREAS_0027")


def convert_task062_nih_pancreas(nifti_images_dir: str, labels_dir: str,
                                 raw_data_base: str | None = None,
                                 reorient: bool = True) -> str:
    """TCIA Pancreas-CT: `nifti_images_dir` holds PANCREAS_XXXX.nii.gz volumes
    (convert the DICOM series beforehand; the reference used dicom2nifti),
    `labels_dir` holds labelXXXX.nii.gz. Both are reoriented to closest
    canonical (RAS) like the reference's nibabel pass, and the 4 known-bad
    cases are dropped."""
    out_base, imagestr, imagests, labelstr = _task_layout(
        "Task062_NIHPancreas", raw_data_base)
    for c in subfiles(nifti_images_dir, join=False, suffix=".nii.gz"):
        casename = c[:-7]
        if casename in TASK062_EXCLUDED:
            continue
        img_out = os.path.join(imagestr, casename + "_0000.nii.gz")
        lab_out = os.path.join(labelstr, casename + ".nii.gz")
        shutil.copy(os.path.join(nifti_images_dir, c), img_out)
        # PANCREAS_0001 -> label0001
        shutil.copy(os.path.join(labels_dir, "label" + c[9:]), lab_out)
        if reorient:
            from multitalent_tpu.utils.reorientation import reorient_file_to_ras
            reorient_file_to_ras(img_out)
            reorient_file_to_ras(lab_out)
    generate_dataset_json(
        os.path.join(out_base, "dataset.json"), imagestr, imagests, ("CT",),
        {0: "background", 1: "Pancreas"}, "NIHPancreas")
    return out_base


def convert_task064_kits(source_dir: str,
                         raw_data_base: str | None = None) -> str:
    """KiTS19 (labels-fixed) data folder (case_00000/{imaging.nii.gz,
    segmentation.nii.gz}): first 210 cases train, rest test -> Task064."""
    out_base, imagestr, imagests, labelstr = _task_layout(
        "Task064_KiTS_labelsFixed", raw_data_base)
    all_cases = subdirs(source_dir, join=False)
    for p in all_cases[:210]:
        curr = os.path.join(source_dir, p)
        shutil.copy(os.path.join(curr, "imaging.nii.gz"),
                    os.path.join(imagestr, p + "_0000.nii.gz"))
        shutil.copy(os.path.join(curr, "segmentation.nii.gz"),
                    os.path.join(labelstr, p + ".nii.gz"))
    for p in all_cases[210:]:
        shutil.copy(os.path.join(source_dir, p, "imaging.nii.gz"),
                    os.path.join(imagests, p + "_0000.nii.gz"))
    generate_dataset_json(
        os.path.join(out_base, "dataset.json"), imagestr, imagests, ("CT",),
        {0: "background", 1: "Kidney", 2: "Tumor"}, "KiTS",
        dataset_description="kidney and kidney tumor segmentation")
    return out_base


CONVERTERS = {
    "Task017": convert_task017_btcv_abdomen,
    "Task018": convert_task018_btcv_cervix,
    "Task055": convert_task055_segthor,
    "Task062": convert_task062_nih_pancreas,
    "Task064": convert_task064_kits,
}
