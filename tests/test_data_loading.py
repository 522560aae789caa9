import numpy as np
import pytest

from multitalent_tpu.data.dataset import (
    delete_npy,
    get_case_identifiers,
    kfold_split,
    load_dataset,
    unpack_dataset,
)
from multitalent_tpu.data.loader import PatchSampler3D, PrefetchPipeline
from multitalent_tpu.preprocessing.preprocessor import sample_class_locations
from multitalent_tpu.utils import save_pickle


def make_dataset(tmp_path, n_cases=3, shape=(20, 24, 24)):
    rng = np.random.default_rng(0)
    for i in range(n_cases):
        data = rng.standard_normal((1, *shape)).astype(np.float32)
        seg = np.zeros((1, *shape), np.float32)
        seg[0, 8:14, 9:15, 9:15] = 1
        seg[0, 10:12, 11:13, 11:13] = 2
        stacked = np.concatenate([data, seg])
        np.savez_compressed(tmp_path / f"case_{i:03d}.npz", data=stacked)
        props = {"class_locations": sample_class_locations(seg[0], [1, 2])}
        save_pickle(props, tmp_path / f"case_{i:03d}.pkl")
    return str(tmp_path)


def test_load_and_unpack(tmp_path):
    folder = make_dataset(tmp_path)
    ds = load_dataset(folder)
    assert len(ds) == 3
    assert "properties" in ds["case_000"]
    unpack_dataset(folder, threads=2)
    assert (tmp_path / "case_000.npy").exists()
    delete_npy(folder)
    assert not (tmp_path / "case_000.npy").exists()
    assert get_case_identifiers(folder) == [f"case_{i:03d}" for i in range(3)]


def test_patch_sampler_shapes_and_padding(tmp_path):
    folder = make_dataset(tmp_path, shape=(10, 12, 12))
    ds = load_dataset(folder)
    sampler = PatchSampler3D(ds, patch_size=(16, 16, 16), final_patch_size=(16, 16, 16),
                             batch_size=2, oversample_foreground_percent=0.33, seed=0)
    batch = sampler.generate_train_batch()
    assert batch["data"].shape == (2, 1, 16, 16, 16)
    assert batch["seg"].shape == (2, 1, 16, 16, 16)
    # patch bigger than case -> seg must be padded with -1 at the borders
    assert (batch["seg"] == -1).any()
    assert len(batch["properties"]) == 2


def test_foreground_oversampling_hits_fg(tmp_path):
    folder = make_dataset(tmp_path)
    ds = load_dataset(folder)
    sampler = PatchSampler3D(ds, patch_size=(8, 8, 8), final_patch_size=(8, 8, 8),
                             batch_size=2, oversample_foreground_percent=0.5, seed=1)
    # with oversample 0.5 and B=2, sample index 1 is always fg-forced; its patch is
    # centered on a fg voxel so it must contain fg
    hits = 0
    for _ in range(10):
        b = sampler.generate_train_batch()
        if (b["seg"][1] > 0).any():
            hits += 1
    assert hits == 10


def test_sampling_probabilities_respected(tmp_path):
    folder = make_dataset(tmp_path)
    ds = load_dataset(folder)
    p = np.array([1.0, 0.0, 0.0])
    sampler = PatchSampler3D(ds, (8, 8, 8), (8, 8, 8), batch_size=4,
                             sampling_probabilities=p, seed=2)
    for _ in range(5):
        b = sampler.generate_train_batch()
        assert all(k == "case_000" for k in b["keys"])


def test_kfold_matches_sklearn():
    sklearn = pytest.importorskip("sklearn")
    from sklearn.model_selection import KFold

    keys = [f"case_{i:02d}" for i in range(23)]
    ours = kfold_split(keys, 5, 12345)
    arr = np.array(sorted(keys))
    kf = KFold(5, shuffle=True, random_state=12345)
    for fold, (tr, te) in enumerate(kf.split(arr)):
        assert sorted(ours[fold]["val"]) == sorted(arr[te].tolist())
        assert sorted(ours[fold]["train"]) == sorted(arr[tr].tolist())


def test_prefetch_pipeline(tmp_path):
    folder = make_dataset(tmp_path)
    ds = load_dataset(folder)

    def factory(worker_id):
        return PatchSampler3D(ds, (8, 8, 8), (8, 8, 8), batch_size=2, seed=worker_id)

    pipe = PrefetchPipeline(factory, num_workers=2, queue_depth=2)
    batches = [next(pipe) for _ in range(5)]
    assert all(b["data"].shape == (2, 1, 8, 8, 8) for b in batches)
    pipe.stop()


def test_prefetch_pipeline_propagates_worker_death():
    """A poisoned sampler (corrupt npz, bad pkl) must raise at the consumer
    within one batch — not deadlock __next__ on an empty queue forever."""
    class PoisonedSampler:
        def generate_train_batch(self):
            raise ValueError("corrupt npz")

    pipe = PrefetchPipeline(lambda w: PoisonedSampler(), num_workers=1,
                            queue_depth=1)
    with pytest.raises(RuntimeError, match="worker died") as exc_info:
        next(pipe)
    assert isinstance(exc_info.value.__cause__, ValueError)
    pipe.stop()


def test_sliding_window_non_oom_error_surfaces_immediately():
    """The TTA-chunk back-off must only retry on resource exhaustion; any
    other error (a genuine bug) surfaces on the first attempt."""
    from multitalent_tpu.ops.sliding_window import _is_oom_error

    assert _is_oom_error(RuntimeError("RESOURCE_EXHAUSTED: while allocating"))
    assert _is_oom_error(RuntimeError("Out of memory allocating 12345 bytes"))
    assert not _is_oom_error(ValueError("shapes do not match"))
    assert not _is_oom_error(RuntimeError("INTERNAL: mosaic lowering failed"))
