"""Accuracy gate: the production trainer must LEARN, not merely run.

A synthetic blobs task (bright spheres on unit noise — trivially separable by
intensity + locality) trained for a few hundred tiny steps must exceed a
pinned online foreground dice. Catches silent training breakage (loss wiring,
augmentation corrupting labels, optimizer misconfig) that smoke tests miss.
The reference has no such gate; expected behavior there is encoded only in
epoch-time docs (SURVEY §4).
"""
import numpy as np
import pytest

from multitalent_tpu.preprocessing.preprocessor import sample_class_locations
from multitalent_tpu.utils import save_pickle

from test_training import tiny_plans


def _make_blobs(tmp_path, n_cases=8, shape=(14, 14, 14)):
    folder = tmp_path / "mtt_data_stage0"
    folder.mkdir(parents=True, exist_ok=True)
    rng = np.random.default_rng(7)
    for i in range(n_cases):
        data = rng.standard_normal((1, *shape)).astype(np.float32)
        seg = np.zeros((1, *shape), np.float32)
        c = rng.integers(4, 10, size=3)
        r = int(rng.integers(2, 4))
        zz, yy, xx = np.ogrid[:shape[0], :shape[1], :shape[2]]
        blob = ((zz - c[0]) ** 2 + (yy - c[1]) ** 2 + (xx - c[2]) ** 2) <= r * r
        seg[0][blob] = 1
        data[0][blob] += 4.0  # strong, learnable contrast
        np.savez_compressed(folder / f"case_{i:03d}.npz",
                            data=np.concatenate([data, seg]))
        save_pickle({"class_locations": sample_class_locations(seg[0], [1])},
                    folder / f"case_{i:03d}.pkl")
    return str(tmp_path)


@pytest.mark.slow
def test_trainer_learns_blobs(tmp_path):
    from multitalent_tpu.training.trainers import TrainerV2

    class GateTrainer(TrainerV2):
        def __init__(self, *a, **kw):
            super().__init__(*a, **kw)
            self.max_num_epochs = 6
            self.num_batches_per_epoch = 25
            self.num_val_batches_per_epoch = 4

    dd = _make_blobs(tmp_path)
    plans = tiny_plans(batch_size=2, patch=(8, 8, 8), num_classes=1)
    t = GateTrainer(plans, 0, str(tmp_path / "out"), dd)
    t.initial_lr = 3e-2  # tiny task: reach signal within the budget
    t.initialize(True)
    t.run_training()
    dices = [float(d) for d in t.all_val_eval_metrics]
    assert np.isfinite(t.all_tr_losses).all()
    assert max(dices) > 0.55, dices
    # and it actually improved over training, not a lucky init
    assert max(dices) > dices[0] or dices[0] > 0.55, dices
