"""Experiment-configuration resolution shared by the CLIs.

Parity target: nnunet/run/default_configuration.py:34-80 — map (network, task,
trainer, plans_identifier) to the plans file, the resolution stage, the batch-dice
policy and the canonical output-folder naming
`RESULTS/nnUNet/<network>/<task>/<trainer>__<plans_identifier>`.
"""
from __future__ import annotations

import os

from multitalent_tpu import paths
from multitalent_tpu.plans import load_plans
from multitalent_tpu.registry import resolve_trainer
from multitalent_tpu.utils.task_names import convert_id_to_task_name

VALID_NETWORKS = ("2d", "3d_lowres", "3d_fullres", "3d_cascade_fullres")


def resolve_task_name(task: str) -> str:
    """Accept 'TaskXXX_name' or a bare integer id."""
    if task.startswith("Task"):
        return task
    return convert_id_to_task_name(int(task))


def get_default_configuration(network: str, task: str, network_trainer: str,
                              plans_identifier: str | None = None):
    assert network in VALID_NETWORKS, f"network must be one of {VALID_NETWORKS}"
    plans_identifier = plans_identifier or paths.default_plans_identifier
    task = resolve_task_name(task)

    dataset_directory = os.path.join(paths.preprocessing_output_dir(), task)
    suffix = "_plans_2D.pkl" if network == "2d" else "_plans_3D.pkl"
    plans_file = os.path.join(dataset_directory, plans_identifier + suffix)
    assert os.path.isfile(plans_file), f"plans file not found: {plans_file}"

    plans = load_plans(plans_file)
    possible_stages = sorted(plans.plans_per_stage.keys())
    if network in ("3d_cascade_fullres", "3d_lowres") and len(possible_stages) == 1:
        raise RuntimeError(
            "3d_lowres/3d_cascade_fullres requires a multi-stage plan; this dataset "
            "does not need a cascade. Use 3d_fullres.")
    if network in ("2d", "3d_lowres"):
        stage = possible_stages[0]
    else:
        stage = possible_stages[-1]

    # batch-dice policy (default_configuration.py:71-76)
    batch_dice = network in ("2d", "3d_lowres")

    trainer_class = resolve_trainer(network_trainer)
    output_folder_name = os.path.join(
        paths.network_training_output_dir(), network, task,
        network_trainer + "__" + plans_identifier)

    print("###############################################")
    print(f"I am running the following nnUNet: {network}")
    print(f"My trainer class is: {trainer_class}")
    print(f"For that I will be using the following configuration:")
    print(f"plans file: {plans_file}, stage: {stage}, batch dice: {batch_dice}")
    print(f"I am using data from this folder: "
          f"{os.path.join(dataset_directory, plans.data_identifier)}")
    print("###############################################")
    return (plans_file, output_folder_name, dataset_directory, batch_dice, stage,
            trainer_class)
