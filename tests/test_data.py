import numpy as np
import pytest

from rgbnomore_tpu.data.index import IndexDataset, load_index, split_train_minival
from rgbnomore_tpu.data.loader import DctCanvasLoader, RgbCanvasLoader

PIL = pytest.importorskip("PIL")
from PIL import Image  # noqa: E402


@pytest.fixture(scope="module")
def mini_dataset(tmp_path_factory):
    """12 tiny JPEGs across 3 classes + an index CSV."""
    root = tmp_path_factory.mktemp("mini")
    rng = np.random.default_rng(0)
    rows = ["Filepath,Label"]
    for i in range(12):
        arr = rng.integers(0, 256, (64, 64, 3), dtype=np.uint8)
        p = root / f"img_{i}.jpg"
        Image.fromarray(arr, "RGB").save(p, quality=90)
        rows.append(f"{p},{i % 3}")
    csv = root / "index.csv"
    csv.write_text("\n".join(rows) + "\n")
    return csv


def test_load_index(mini_dataset):
    ds = load_index(mini_dataset)
    assert len(ds) == 12
    assert ds.labels.dtype == np.int32
    assert set(ds.labels.tolist()) == {0, 1, 2}


def test_split_deterministic(mini_dataset):
    ds = load_index(mini_dataset)
    t1, v1, tv1 = split_train_minival(ds, split=0.25, trainval_frac=0.5, seed=7)
    t2, v2, tv2 = split_train_minival(ds, split=0.25, trainval_frac=0.5, seed=7)
    np.testing.assert_array_equal(t1.paths, t2.paths)
    np.testing.assert_array_equal(v1.paths, v2.paths)
    assert len(v1) == 3 and len(t1) == 9
    assert set(v1.paths) & set(t1.paths) == set()


def test_dct_loader_batches(mini_dataset):
    ds = load_index(mini_dataset)
    loader = DctCanvasLoader(ds, batch_size=4, canvas=8, shuffle=True, seed=1, num_threads=2)
    batches = list(loader)
    assert len(batches) == 3
    b = batches[0]
    assert b["y"].shape == (4, 1, 8, 8, 8, 8) and b["y"].dtype == np.int16
    assert b["cbcr"].shape == (4, 2, 4, 4, 8, 8)
    assert b["quant"].shape == (4, 3, 8, 8) and (b["quant"][:, 0] > 0).all()
    assert (b["weights"] == 1.0).all()
    assert b["y"].any(), "coefficients must be non-zero"


def test_dct_loader_epoch_shuffle_differs(mini_dataset):
    ds = load_index(mini_dataset)
    loader = DctCanvasLoader(ds, batch_size=12, canvas=8, shuffle=True, seed=1, num_threads=2)
    loader.set_epoch(0)
    l0 = next(iter(loader))["labels"].copy()
    loader.set_epoch(1)
    l1 = next(iter(loader))["labels"].copy()
    assert not np.array_equal(l0, l1)
    assert sorted(l0) == sorted(l1)


def test_dct_loader_sharding_no_overlap(mini_dataset):
    """Eval sharding: strided slices cover everything exactly once."""
    ds = load_index(mini_dataset)
    seen = []
    for shard in range(3):
        loader = DctCanvasLoader(
            ds, batch_size=2, canvas=8, shuffle=False, shard_id=shard, num_shards=3, num_threads=2
        )
        for b in loader:
            seen.extend(b["labels"][b["weights"] > 0].tolist())
    assert len(seen) == 12


def test_dct_loader_pads_last_batch_with_zero_weights(mini_dataset):
    ds = load_index(mini_dataset)
    loader = DctCanvasLoader(ds, batch_size=5, canvas=8, shuffle=False, num_threads=2)
    batches = list(loader)
    assert len(batches) == 3
    last = batches[-1]
    assert last["weights"].sum() == 2.0  # 12 = 5 + 5 + 2
    assert (last["weights"][2:] == 0).all()


def test_dct_loader_decode_error_surfaces(tmp_path, mini_dataset):
    bad = tmp_path / "bad.jpg"
    bad.write_bytes(b"not a jpeg at all")
    ds = IndexDataset(np.asarray([str(bad)], dtype=object), np.asarray([0], np.int32))
    loader = DctCanvasLoader(ds, batch_size=1, canvas=8, num_threads=1)
    with pytest.raises(RuntimeError):
        list(loader)


def test_rgb_loader(mini_dataset):
    ds = load_index(mini_dataset)
    loader = RgbCanvasLoader(ds, batch_size=4, image_size=64, shuffle=False, num_threads=2)
    b = next(iter(loader))
    assert b["pixels"].shape == (4, 3, 64, 64) and b["pixels"].dtype == np.uint8
    assert b["pixels"].any()


def test_staging_index_builder(tmp_path):
    from rgbnomore_tpu.data.staging import build_index_csv

    rng = np.random.default_rng(0)
    for cls in ("n01", "n02"):
        d = tmp_path / "train" / cls
        d.mkdir(parents=True)
        for i in range(2):
            arr = rng.integers(0, 256, (16, 16, 3), dtype=np.uint8)
            Image.fromarray(arr, "RGB").save(d / f"{cls}_{i}.JPEG")
    n = build_index_csv(tmp_path, tmp_path / "idx.csv", "train")
    assert n == 4
    ds = load_index(tmp_path / "idx.csv")
    assert len(ds) == 4 and set(ds.labels.tolist()) == {0, 1}


def test_staging_png_masquerade(tmp_path):
    from rgbnomore_tpu.data.staging import transcode_png_masquerade
    from rgbnomore_tpu import codec

    d = tmp_path / "train" / "n02105855"
    d.mkdir(parents=True)
    arr = np.zeros((16, 16, 3), np.uint8)
    png_path = d / "n02105855_2933.JPEG"
    Image.fromarray(arr, "RGB").save(png_path, format="PNG")  # PNG in disguise
    with pytest.raises(RuntimeError):
        codec.read_coefficients(str(png_path))
    assert transcode_png_masquerade(tmp_path / "train")
    dims, quant, y, cbcr = codec.read_coefficients(str(png_path))  # now decodes
    assert y.shape == (1, 2, 2, 8, 8)


def test_staging_valprep_end_to_end(tmp_path):
    """Synthetic-tar staging produces a CLASSED val tree + index CSV
    (VERDICT item 4: the reference runs valprep.sh during staging,
    ``datasets.py:150-170``)."""
    import tarfile

    from rgbnomore_tpu.data.staging import (
        build_index_csv,
        load_valprep_mapping,
        stage_dataset,
    )

    mapping = load_valprep_mapping()
    assert len(mapping) == 50000  # the full vendored valprep.sh data
    assert mapping["ILSVRC2012_val_00000001.JPEG"] == "n01751748"

    # build ILSVRC-shaped tars: train = outer tar of per-class tars,
    # val = flat images named like the real val set
    rng = np.random.default_rng(0)
    src = tmp_path / "src"
    src.mkdir()
    scratch = tmp_path / "scratch"
    scratch.mkdir()

    def jpg(path):
        arr = rng.integers(0, 256, (32, 32, 3), dtype=np.uint8)
        Image.fromarray(arr, "RGB").save(path, "JPEG")

    class_tars = []
    for cls in ("n01440764", "n01443537"):
        cdir = scratch / cls
        cdir.mkdir()
        for i in range(2):
            jpg(cdir / f"{cls}_{i}.JPEG")
        ct = scratch / f"{cls}.tar"
        with tarfile.open(ct, "w") as t:
            for p in sorted(cdir.iterdir()):
                t.add(p, arcname=p.name)
        class_tars.append(ct)
    with tarfile.open(src / "ILSVRC2012_img_train.tar", "w") as t:
        for ct in class_tars:
            t.add(ct, arcname=ct.name)
    val_names = ["ILSVRC2012_val_00000001.JPEG", "ILSVRC2012_val_00000002.JPEG"]
    for name in val_names:
        jpg(scratch / name)
    with tarfile.open(src / "ILSVRC2012_img_val.tar", "w") as t:
        for name in val_names:
            t.add(scratch / name, arcname=name)

    staged = tmp_path / "staged"
    stage_dataset(src, staged, workers=2, no_resize=True)

    # val tree is classed per the vendored mapping — NOT flat
    assert (staged / "val" / "n01751748" / val_names[0]).exists()
    assert (staged / "val" / "n09193705" / val_names[1]).exists()
    assert not (staged / "val" / val_names[0]).exists()
    n = build_index_csv(staged, tmp_path / "val_idx.csv", "val")
    assert n == 2
    ds = load_index(tmp_path / "val_idx.csv")
    assert len(ds) == 2 and set(ds.labels.tolist()) == {0, 1}
    n = build_index_csv(staged, tmp_path / "train_idx.csv", "train")
    assert n == 4


def test_index_builder_rejects_flat_val(tmp_path):
    """build_index_csv must fail loudly on an un-valprepped flat val dir."""
    from rgbnomore_tpu.data.staging import build_index_csv

    flat = tmp_path / "val"
    flat.mkdir()
    arr = np.zeros((16, 16, 3), np.uint8)
    Image.fromarray(arr, "RGB").save(flat / "ILSVRC2012_val_00000001.JPEG")
    with pytest.raises(ValueError, match="valprep"):
        build_index_csv(tmp_path, tmp_path / "idx.csv", "val")


def test_loader_early_abandon_does_not_leak_producer(mini_dataset):
    """Breaking out of iteration must stop the producer thread promptly."""
    import threading
    import time

    ds = load_index(mini_dataset)
    before = threading.active_count()
    loader = DctCanvasLoader(ds, batch_size=2, canvas=8, shuffle=False,
                             num_threads=2, prefetch=1)
    it = iter(loader)
    next(it)  # take one batch, abandon the rest
    it.close()
    deadline = time.time() + 5.0
    while threading.active_count() > before and time.time() < deadline:
        time.sleep(0.05)
    assert threading.active_count() <= before + 1  # pool teardown may lag briefly


def test_iter_cycle_spans_epochs(mini_dataset):
    ds = load_index(mini_dataset)
    loader = DctCanvasLoader(ds, batch_size=6, canvas=8, shuffle=True, seed=3,
                             drop_last=True, num_threads=2)
    batches = list(loader.iter_cycle(5))  # 2 batches/epoch -> 2.5 epochs
    assert len(batches) == 5
    labels = np.concatenate([b["labels"] for b in batches])
    assert len(labels) == 30


def test_eval_shards_have_equal_batch_counts(mini_dataset):
    """Uneven strided shards are padded so all shards run the same number of
    batches (multi-host collectives would deadlock otherwise)."""
    ds = load_index(mini_dataset)  # 12 samples
    loaders = [
        DctCanvasLoader(ds, batch_size=2, canvas=8, shuffle=False,
                        shard_id=s, num_shards=5, num_threads=1)
        for s in range(5)
    ]
    counts = [len(list(l)) for l in loaders]
    assert len(set(counts)) == 1, counts
    # weighted totals still count every sample exactly once
    total = sum(float(b["weights"].sum()) for l in loaders for b in l)
    assert total == 12.0
