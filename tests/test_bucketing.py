"""Aspect-ratio bucketing (train/dataset.py) — beyond the reference's square
crop (train_lora_pipeline.py:62-123 always center/random-crops to a square).

kohya-style: images group into aspect buckets of ~resolution^2 area; every
batch is shape-homogeneous so the jitted train step compiles once per bucket.
"""

import os

import numpy as np
import pytest
from PIL import Image

from stablediffusion_tpu.train.dataset import (
    SDLoRADataset,
    assign_bucket,
    bucket_resolutions,
)


def test_bucket_resolutions_invariants():
    for base, step in ((1024, 64), (512, 64), (64, 16)):
        buckets = bucket_resolutions(base, step=step, max_ar=2.0)
        assert (base, base) in buckets
        for h, w in buckets:
            assert h % step == 0 and w % step == 0, (h, w)
            assert h * w <= base * base + step * step  # area cap (+rounding)
            assert 0.49 <= h / w <= 2.01, (h, w)
        # portrait/landscape symmetry
        assert all((w, h) in buckets for h, w in buckets)
        # bounded compile cost
        assert len(buckets) < 40


def test_assign_bucket_picks_nearest_aspect():
    buckets = [(512, 512), (384, 640), (640, 384)]
    assert buckets[assign_bucket(500, 500, buckets)] == (512, 512)
    assert buckets[assign_bucket(300, 520, buckets)] == (384, 640)  # wide
    assert buckets[assign_bucket(520, 300, buckets)] == (640, 384)  # tall


def _write_images(tmpdir, sizes):
    rng = np.random.default_rng(0)
    for i, (w, h) in enumerate(sizes):
        arr = rng.integers(0, 255, (h, w, 3), np.uint8)
        Image.fromarray(arr).save(os.path.join(tmpdir, f"img{i:03d}.png"))
        with open(os.path.join(tmpdir, f"img{i:03d}.txt"), "w") as f:
            f.write(f"caption {i}")


def test_bucketed_batches_are_shape_homogeneous(tmp_path):
    d = str(tmp_path)
    # 6 wide, 6 tall, 4 square images
    _write_images(d, [(100, 50)] * 6 + [(50, 100)] * 6 + [(80, 80)] * 4)
    ds = SDLoRADataset(
        d, resolution=64, seed=0, aspect_ratio_bucketing=True,
        bucket_step=16, max_bucket_ar=2.0,
    )
    assert ds.buckets is not None and len(ds.buckets) >= 3
    assert sum(len(b) for b in ds.bucket_items) == 16

    seen_shapes = set()
    n = 0
    for batch in ds.batches(2, epochs=1, num_workers=1):
        h, w = batch["pixel_values"].shape[1:3]
        assert (h, w) in ds.buckets
        # micro-conditioning target carries the bucket, not a square
        assert (batch["target_sizes"] == [h, w]).all()
        seen_shapes.add((h, w))
        n += batch["pixel_values"].shape[0]
    assert n == 16  # bucket sizes here are all even: nothing dropped
    assert len(seen_shapes) >= 3  # wide, tall and square all trained
    assert any(h != w for h, w in seen_shapes), "non-square shapes preserved"


def test_bucketed_stream_is_deterministic(tmp_path):
    d = str(tmp_path)
    _write_images(d, [(100, 50)] * 4 + [(50, 100)] * 4)

    def collect():
        ds = SDLoRADataset(d, resolution=64, seed=7,
                           aspect_ratio_bucketing=True, bucket_step=16)
        return [
            (b["pixel_values"].shape, b["pixel_values"].sum())
            for b in ds.batches(2, epochs=1, num_workers=4)
        ]

    assert collect() == collect()


def test_square_path_unchanged_by_feature(tmp_path):
    d = str(tmp_path)
    _write_images(d, [(100, 50)] * 4)
    ref = SDLoRADataset(d, resolution=64, seed=3)
    new = SDLoRADataset(d, resolution=64, seed=3, aspect_ratio_bucketing=False)
    b1 = next(iter(ref.batches(2, epochs=1, num_workers=1)))
    b2 = next(iter(new.batches(2, epochs=1, num_workers=1)))
    np.testing.assert_array_equal(b1["pixel_values"], b2["pixel_values"])


def test_trainer_rejects_bucketing_without_folder_dataset(tmp_path):
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_tiny_model

    from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs

    d = str(tmp_path)
    _write_images(d, [(64, 64)] * 2)
    model = make_tiny_model("sd15")
    args = SDTrainingArgs(
        train_batch_size=1, max_train_steps=1, resolution=32,
        aspect_ratio_bucketing=True, report_to=None,
        output_dir=str(tmp_path / "out"),
    )

    class FakeDataset:
        def __len__(self):
            return 2

    with pytest.raises(ValueError, match="bucketing"):
        SDLoRATrainer(model, args, dataset=FakeDataset()).train()


def test_bucketed_train_loop_tiny(tmp_path):
    """End-to-end: a tiny LoRA train run over mixed-aspect data — the jitted
    step recompiles per bucket shape and losses stay finite."""
    import sys

    sys.path.insert(0, os.path.dirname(__file__))
    from helpers import make_tiny_model

    from stablediffusion_tpu.train.trainer import SDLoRATrainer, SDTrainingArgs

    d = str(tmp_path / "data")
    os.makedirs(d)
    _write_images(d, [(64, 32)] * 2 + [(32, 64)] * 2)
    model = make_tiny_model("sd15")
    args = SDTrainingArgs(
        train_batch_size=2, max_train_steps=4, resolution=32,
        rank=2, train_text_encoder=False, mixed_precision="no",
        aspect_ratio_bucketing=True, bucket_step=16,
        report_to=None, output_dir=str(tmp_path / "out"),
        lr_scheduler="constant", lr_warmup_steps=0, log_every=1,
    )
    trainer = SDLoRATrainer(model, args, data_dir=d)
    lora = trainer.train()
    assert "unet" in lora


def test_max_buckets_merges_smallest_into_nearest_aspect(tmp_path):
    """--max_buckets caps OCCUPIED bucket shapes (each one is a separate
    multi-minute XLA compile on a remote-compile TPU): smallest buckets
    merge into the nearest-aspect survivor, items retained."""
    d = str(tmp_path)
    # 6 wide, 6 tall, 2 square (the square bucket is smallest -> merged)
    _write_images(d, [(100, 50)] * 6 + [(50, 100)] * 6 + [(80, 80)] * 2)
    ds_free = SDLoRADataset(
        d, resolution=64, seed=0, aspect_ratio_bucketing=True,
        bucket_step=16, max_bucket_ar=2.0,
    )
    occ_free = [b for b in ds_free.bucket_items if b]
    assert len(occ_free) >= 3

    ds = SDLoRADataset(
        d, resolution=64, seed=0, aspect_ratio_bucketing=True,
        bucket_step=16, max_bucket_ar=2.0, max_buckets=2,
    )
    occ = [i for i, b in enumerate(ds.bucket_items) if b]
    assert len(occ) == 2
    assert sum(len(b) for b in ds.bucket_items) == 14  # nothing lost
    # batches only ever use the surviving shapes
    shapes = set()
    for batch in ds.batches(2, epochs=1, num_workers=1):
        shapes.add(batch["pixel_values"].shape[1:3])
    assert len(shapes) <= 2
    for h, w in shapes:
        assert (int(h), int(w)) in [ds.buckets[i] for i in occ]

    # cap of 1 collapses to one shape; everything still trains
    ds1 = SDLoRADataset(
        d, resolution=64, seed=0, aspect_ratio_bucketing=True,
        bucket_step=16, max_bucket_ar=2.0, max_buckets=1,
    )
    assert sum(1 for b in ds1.bucket_items if b) == 1
    assert sum(len(b) for b in ds1.bucket_items) == 14

    with pytest.raises(ValueError):
        SDLoRADataset(
            d, resolution=64, seed=0, aspect_ratio_bucketing=True,
            bucket_step=16, max_buckets=0,
        )
