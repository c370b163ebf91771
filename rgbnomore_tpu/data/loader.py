"""Threaded canvas loaders: JPEG entropy decode -> fixed-size int16 batches.

The host's only job in the hot path is the sequential libjpeg Huffman decode
(``codec.read_into_canvas``, which releases the GIL) plus batch assembly;
dequantization and all augmentation run on-device.  A thread pool decodes
directly into per-batch canvas arrays and a background thread keeps a small
queue of ready batches ahead of the training loop.

Batch layout (all numpy, ready for ``device_put``):
    y      (B, 1, CANVAS, CANVAS, 8, 8) int16   quantized Y coefficients
    cbcr   (B, 2, CANVAS/2, CANVAS/2, 8, 8) int16
    quant  (B, 3, 8, 8) int16                    per-sample quant tables
    labels (B,) int32
    weights(B,) float32                          0 for padding examples

Sharding across hosts: each loader takes ``(shard_id, num_shards)`` and reads
only its strided slice — train shards rebalance per epoch with the shuffle;
eval uses the same strided rank slicing as the reference's no-padding
``DistributedEvalSampler`` (``utils/custom_sampler.py:53-104``), with padding
expressed as zero weights instead of dropped examples.
"""

from __future__ import annotations

import queue
import threading
from concurrent.futures import ThreadPoolExecutor

import numpy as np

from rgbnomore_tpu import codec
from rgbnomore_tpu.data.index import IndexDataset

__all__ = ["DctCanvasLoader", "DctPackedLoader", "DctCroppedLoader", "RgbCanvasLoader"]


class _BaseLoader:
    def __init__(
        self,
        dataset: IndexDataset,
        batch_size: int,
        *,
        shuffle: bool = False,
        drop_last: bool = False,
        seed: int = 0,
        shard_id: int = 0,
        num_shards: int = 1,
        num_threads: int = 4,
        prefetch: int = 2,
    ):
        self.dataset = dataset
        self.batch_size = batch_size
        self.shuffle = shuffle
        self.drop_last = drop_last
        self.seed = seed
        self.shard_id = shard_id
        self.num_shards = num_shards
        self.num_threads = num_threads
        self.prefetch = prefetch
        self.epoch = 0

    def set_epoch(self, epoch: int) -> None:
        """Reseed the shuffle per epoch (reference: ``sampler.set_epoch``)."""
        self.epoch = epoch

    def _shard_len(self) -> int:
        """Per-shard sample count; identical on every shard (padded)."""
        n = len(self.dataset)
        return (n + self.num_shards - 1) // self.num_shards

    def _epoch_indices(self) -> np.ndarray:
        n = len(self.dataset)
        if self.shuffle:
            rng = np.random.default_rng(self.seed + self.epoch)
            order = rng.permutation(n)
            # pad to equal shards like DistributedSampler (datasets.py:533-535)
            pad = (-len(order)) % self.num_shards
            if pad:
                order = np.concatenate([order, order[:pad]])
            return order[self.shard_id :: self.num_shards]
        # eval: strided rank slicing (custom_sampler.py:88), padded with -1
        # sentinels (weight 0) so every shard runs the SAME number of batches
        # — per-batch SPMD collectives would deadlock otherwise
        idx = np.arange(n)[self.shard_id :: self.num_shards]
        pad = self._shard_len() - len(idx)
        if pad:
            idx = np.concatenate([idx, np.full(pad, -1, idx.dtype)])
        return idx

    def __len__(self) -> int:
        """Batches per shard per epoch; cheap (no permutation materialized)."""
        n = self._shard_len()
        if self.drop_last:
            return n // self.batch_size
        return (n + self.batch_size - 1) // self.batch_size

    def _decode_batch(self, pool: ThreadPoolExecutor, idx: np.ndarray,
                      batch_index: int = 0) -> dict:
        raise NotImplementedError

    def _iterate(self, total_batches: int | None, cycle: bool):
        if cycle and len(self) == 0:
            # with drop_last a shard smaller than one batch yields ZERO
            # batches per epoch; cycling would spin forever producing nothing
            raise ValueError(
                f"cannot cycle over an empty loader: shard has "
                f"{self._shard_len()} examples < batch_size={self.batch_size} "
                f"(drop_last)"
            )
        out_q: queue.Queue = queue.Queue(maxsize=self.prefetch)
        stop = threading.Event()

        def put_or_stop(item) -> bool:
            """Put with stop polling so an abandoned consumer never strands
            the producer inside a full queue (leaking thread + batches)."""
            while not stop.is_set():
                try:
                    out_q.put(item, timeout=0.2)
                    return True
                except queue.Full:
                    continue
            return False

        def producer():
            produced = 0
            with ThreadPoolExecutor(self.num_threads) as pool:
                while True:
                    indices = self._epoch_indices()
                    nb = len(self)
                    for b in range(nb):
                        if stop.is_set():
                            return
                        if total_batches is not None and produced >= total_batches:
                            put_or_stop(None)
                            return
                        lo = b * self.batch_size
                        batch_idx = indices[lo : lo + self.batch_size]
                        try:
                            if not put_or_stop(self._decode_batch(pool, batch_idx, b)):
                                return
                        except Exception as exc:  # surface decode errors
                            put_or_stop(exc)
                            return
                        produced += 1
                    if not cycle:
                        put_or_stop(None)
                        return
                    self.epoch += 1  # continuous mode: advance the shuffle

        t = threading.Thread(target=producer, daemon=True)
        t.start()
        try:
            while True:
                item = out_q.get()
                if item is None:
                    return
                if isinstance(item, Exception):
                    raise item
                yield item
        finally:
            stop.set()

    def __iter__(self):
        return self._iterate(None, cycle=False)

    def iter_cycle(self, total_batches: int):
        """Continuous multi-epoch iteration without producer restarts —
        keeps the decode pipeline warm for steady-state benchmarking and
        epoch-boundary-free training loops."""
        return self._iterate(total_batches, cycle=True)


def _check_chroma_grid(path, ncomp: int, yh: int, yw: int, ch: int, cw: int):
    """Fail loudly on non-4:2:0 color JPEGs instead of silently garbling.

    Every coefficient consumer here (and in the reference, whose loaders
    return Y (1,h,w,8,8) / CbCr (2,h/2,w/2,8,8), ``datasets.py:286-297``)
    assumes 2x2-subsampled chroma; 4:4:4/4:2:2 inputs would decode with the
    chroma plane stretched.  The staging resizer re-encodes to 4:2:0.
    """
    if ncomp == 3 and (ch != (yh + 1) // 2 or cw != (yw + 1) // 2):
        raise ValueError(
            f"{path}: chroma block grid {ch}x{cw} does not match 4:2:0 for "
            f"luma {yh}x{yw}. Re-stage the dataset (data.staging resizes and "
            "re-encodes to 4:2:0), or use transfer='dense' for the RGB domain."
        )


class DctCanvasLoader(_BaseLoader):
    """Loads quantized DCT coefficient canvases (the JPEG/DCT domain path)."""

    def __init__(self, dataset: IndexDataset, batch_size: int, canvas: int = 64, **kw):
        super().__init__(dataset, batch_size, **kw)
        self.canvas = canvas

    def _decode_batch(self, pool: ThreadPoolExecutor, idx: np.ndarray,
                      batch_index: int = 0) -> dict:
        bsz = self.batch_size
        cv = self.canvas
        y = np.zeros((bsz, 1, cv, cv, 8, 8), np.int16)
        c = np.zeros((bsz, 2, cv // 2, cv // 2, 8, 8), np.int16)
        quant = np.ones((bsz, 3, 8, 8), np.int16)
        labels = np.zeros((bsz,), np.int32)
        weights = np.zeros((bsz,), np.float32)

        def work(slot: int, ds_index: int):
            if ds_index < 0:  # shard-padding sentinel
                return
            path = self.dataset.paths[ds_index]
            ncomp, yh, yw, ch, cw, *_ = codec.read_into_canvas(
                path, y[slot], c[slot], quant[slot]
            )
            _check_chroma_grid(path, ncomp, yh, yw, ch, cw)
            labels[slot] = self.dataset.labels[ds_index]
            weights[slot] = 1.0

        list(pool.map(lambda args: work(*args), enumerate(idx)))
        return {"y": y, "cbcr": c, "quant": quant, "labels": labels, "weights": weights}


def packed_layout(canvas: int, k: int, fmt: str = "mask", geom: bool = False) -> dict:
    """Per-SAMPLE byte layout of the consolidated packed row.

    All per-sample fields live in one uint8 row so a whole batch transfers as
    a single ``(B, row_bytes)`` buffer (shardable on the batch axis; one
    device_put call — per-transfer overhead through thin links is
    significant).  Returns field -> (byte_offset, per-sample shape, dtype)
    plus ``"row"`` -> row bytes.

    ``fmt="mask"`` (default): positions ride in an 8-byte/block occupancy
    bitmask (``iy``/``ic`` shaped (..., 8)) — 25 B/block at K=16.
    ``fmt="index"``: one uint8 position per value (``iy``/``ic`` shaped
    (..., K)) — 33 B/block.  Same int8-value quantization either way.
    ``fmt="mask16"``: like ``mask`` plus exact int16 DC planes ``dy``/``dc``
    and a DC-free AC scale — near-lossless, K+11 B/block (RGB-domain default).
    ``fmt="mask16w"``: mask16 with int16 AC values (scale pinned 1) — exact
    for identity crops, +-0.5 dequant units otherwise, 2K+11 B/block.  Meant
    for eval wires where the top-1 budget outranks bytes (KSWEEP.json).
    ``fmt="mask16q"``: byte-identical layout to ``mask16`` but the values are
    JPEG *quantized-unit* integers (host requantizes the resized plane, the
    device multiplies the quant table back) — top-K then ranks in the same
    perceptual domain as the full-canvas packed wire and drops sub-half-quant
    resize/noise residue (DCT-domain train default; see CROPBISECT.json).
    """
    assert fmt in ("mask", "index", "mask16", "mask16w", "mask16q"), fmt
    cv2 = canvas // 2
    iw = k if fmt == "index" else 8  # index/mask bytes per block
    vdt = np.int16 if fmt == "mask16w" else np.int8
    fields = {
        "vy": ((1, canvas, canvas, k), vdt),
        "iy": ((1, canvas, canvas, iw), np.uint8),
        "sy": ((1, canvas, canvas), np.uint8),
        "vc": ((2, cv2, cv2, k), vdt),
        "ic": ((2, cv2, cv2, iw), np.uint8),
        "sc": ((2, cv2, cv2), np.uint8),
        "quant": ((3, 8, 8), np.int16),
        "labels": ((), np.int32),
        "weights": ((), np.float32),
    }
    if fmt in ("mask16", "mask16w", "mask16q"):
        fields["dy"] = ((1, canvas, canvas), np.int16)
        fields["dc"] = ((2, cv2, cv2), np.int16)
    if geom:
        # RGB crop-before-pack residual-resample box: sy0, sh, sx0, sw in
        # downsampled-window pixel coords (see codec.read_rgb_crop_pack_row)
        fields["geom"] = ((4,), np.float32)
    layout = {}
    off = 0
    for name, (shape, dtype) in fields.items():
        nbytes = int(np.prod(shape, dtype=np.int64)) * np.dtype(dtype).itemsize
        off = (off + 3) // 4 * 4  # align for int16/int32/float32 views
        layout[name] = (off, shape, np.dtype(dtype))
        off += nbytes
    layout["row"] = (off + 3) // 4 * 4
    return layout


def row_views(row: np.ndarray, layout: dict) -> dict[str, np.ndarray]:
    """Writable zero-copy dtype/shape views of ONE contiguous row buffer."""
    out = {}
    for name, spec in layout.items():
        if name == "row":
            continue
        off, shape, dtype = spec
        n = int(np.prod(shape, dtype=np.int64))
        out[name] = np.frombuffer(row, dtype=dtype, count=n, offset=off).reshape(shape)
    return out


class DctPackedLoader(_BaseLoader):
    """Sparse top-K packed coefficient loader, shipped as ONE consolidated
    (B, row) buffer per batch.  Wire formats (see ``packed_layout``): ``mask``
    5x fewer host->device bytes than dense int16 at K=16 (DCT default),
    ``mask16`` near-lossless full spectrum at K=63 (RGB default, 1.7x fewer
    bytes than dense pixel canvases), ``index`` the legacy pair format.

    Yields ``{"packed": uint8 (B, row), "labels": ..., "weights": ...}``;
    labels/weights are host-side copies for bookkeeping — the device step
    re-slices every field (including labels/weights) from ``packed`` via
    ``augment.pipeline.split_packed_batch``.
    """

    def __init__(self, dataset: IndexDataset, batch_size: int, canvas: int = 64,
                 k: int = 16, fmt: str = "mask", **kw):
        super().__init__(dataset, batch_size, **kw)
        self.canvas = canvas
        self.k = k
        self.fmt = fmt
        self.layout = packed_layout(canvas, k, fmt)
        if fmt == "mask16":
            self._read_views = lambda path, v: codec.read_into_packed_mask16(
                path, self.k, v["vy"], v["iy"], v["sy"], v["dy"],
                v["vc"], v["ic"], v["sc"], v["dc"], v["quant"])
        else:
            read = (codec.read_into_packed_mask if fmt == "mask"
                    else codec.read_into_packed)
            self._read_views = lambda path, v, _r=read: _r(
                path, self.k, v["vy"], v["iy"], v["sy"],
                v["vc"], v["ic"], v["sc"], v["quant"])

    def _decode_batch(self, pool: ThreadPoolExecutor, idx: np.ndarray,
                      batch_index: int = 0) -> dict:
        buf = np.zeros((self.batch_size, self.layout["row"]), np.uint8)
        labels = np.zeros((self.batch_size,), np.int32)
        weights = np.zeros((self.batch_size,), np.float32)

        def work(slot: int, ds_index: int):
            if ds_index < 0:  # shard-padding sentinel
                return
            v = row_views(buf[slot], self.layout)
            path = self.dataset.paths[ds_index]
            ncomp, yh, yw, ch, cw = self._read_views(path, v)
            _check_chroma_grid(path, ncomp, yh, yw, ch, cw)
            v["labels"][...] = self.dataset.labels[ds_index]
            v["weights"][...] = 1.0
            labels[slot] = self.dataset.labels[ds_index]
            weights[slot] = 1.0

        list(pool.map(lambda args: work(*args), enumerate(idx)))
        return {"packed": buf, "labels": labels, "weights": weights}


class DctCroppedLoader(_BaseLoader):
    """Crop-before-pack loader: the host samples the crop box, resizes the
    window to the TARGET grid and ships only ``target^2 (+ 2 chroma)`` blocks
    in the ``mask16`` wire format — ~5x fewer host->device bytes than the
    full-canvas packed loaders at the same K.

    This matches the reference's data movement order (crop/resize on the CPU
    before anything reaches the accelerator, ``custom_transforms.py:527-669``)
    while keeping flip + RandAugment + ToRange on-device.  Crop boxes are
    sampled on the TRUE image block grid (not a padded canvas), so images
    smaller than the canvas get the reference's exact crop distribution.

    ``mode``: ``"train"`` random-resized-crop, ``"center"`` the ViT val
    ResizedCenterCrop (crop ratio ``target/(target+4)``), ``"full"`` the swin
    val whole-image resize.  The wire carries DEQUANTIZED coefficients —
    pair with ``augment.pipeline.make_cropped_*_pipeline`` (no on-device
    dequant/crop).
    """

    def __init__(self, dataset: IndexDataset, batch_size: int, target: int = 28,
                 k: int = 16, mode: str = "train",
                 scale: tuple[float, float] = (0.05, 1.0),
                 center_ratio: float | None = None, max_src: int = 64,
                 fmt: str = "mask16", **kw):
        super().__init__(dataset, batch_size, **kw)
        from rgbnomore_tpu.data.croppack import build_op_pack

        assert mode in ("train", "center", "full"), mode
        assert fmt in ("mask16", "mask16w", "mask16q"), fmt
        self.target = target
        self.k = k
        self.fmt = fmt
        self.wide = fmt == "mask16w"
        self.requant = fmt == "mask16q"
        self.mode = mode
        self.mode_int = {"train": codec.CROP_RANDOM, "center": codec.CROP_CENTER,
                         "full": codec.CROP_FULL}[mode]
        self.scale = scale
        # reference val: ResizedCenterCrop_DCT(size+4, size) (datasets.py:364)
        self.center_ratio = center_ratio or target / (target + 4)
        self.pack = build_op_pack(target, max_src)
        self.layout = packed_layout(target, k, fmt)
        self._offsets = codec.crop_row_offsets(self.layout)

    def _decode_batch(self, pool: ThreadPoolExecutor, idx: np.ndarray,
                      batch_index: int = 0) -> dict:
        buf = np.zeros((self.batch_size, self.layout["row"]), np.uint8)
        labels = np.zeros((self.batch_size,), np.int32)
        weights = np.zeros((self.batch_size,), np.float32)
        # deterministic per-(seed, epoch, batch) crop randomness, drawn once
        # up front so the thread pool stays RNG-free
        rng = np.random.default_rng([self.seed, self.epoch, batch_index])
        uniforms = rng.random((self.batch_size, 12))
        ds_labels = self.dataset.labels
        ds_paths = self.dataset.paths

        def work(slot: int, ds_index: int):
            if ds_index < 0:  # shard-padding sentinel
                return
            label = int(ds_labels[ds_index])
            path = ds_paths[ds_index]
            # single GIL-free call writes every field (incl. label/weight)
            # straight into the consolidated row
            ncomp, yh, yw, ch, cw, *_box = codec.read_crop_resize_pack_row(
                path, self.k, self.mode_int, uniforms[slot], self.pack,
                buf[slot], self._offsets, label, 1.0,
                scale=self.scale, ratio=self.center_ratio, wide=self.wide,
                requant=self.requant,
            )
            _check_chroma_grid(path, ncomp, yh, yw, ch, cw)
            labels[slot] = label
            weights[slot] = 1.0

        list(pool.map(lambda args: work(*args), enumerate(idx)))
        return {"packed": buf, "labels": labels, "weights": weights}


class RgbCroppedLoader(_BaseLoader):
    """RGB crop-before-pack loader: the host samples the reference's
    PIXEL-granular crop box (torchvision RandomResizedCrop for train,
    Resize+CenterCrop for ViT val, whole-image for swin val —
    ``datasets.py:317-347``), ships only the block-aligned window covering it
    in a fixed ``size/8``-block mask16 wire (~87 KB/img at 224 vs 444 KB for
    the full 64-block canvas), spectrally pre-downsampled per axis by the
    smallest f in {1, 2, 4} that fits.  The device JPEG-tail-decodes the
    window and applies the residual fractional box with the same bilinear
    resampler the full-canvas path uses
    (``augment.pipeline.make_rgb_cropped_*_pipeline``).
    """

    def __init__(self, dataset: IndexDataset, batch_size: int, size: int = 224,
                 k: int = 63, mode: str = "train",
                 scale: tuple[float, float] = (0.05, 1.0),
                 resize_to: float = 256.0, **kw):
        super().__init__(dataset, batch_size, **kw)
        from rgbnomore_tpu.data.croppack import rgb_downsample_blocks

        assert mode in ("train", "center", "full"), mode
        assert size % 16 == 0, "window needs whole chroma blocks"
        self.size = size
        self.k = k
        self.mode = mode
        self.mode_int = {"train": codec.RGB_CROP_TRAIN,
                         "center": codec.RGB_CROP_CENTER,
                         "full": codec.RGB_CROP_FULL}[mode]
        self.scale = scale
        self.resize_to = resize_to
        self.g2, self.g4 = rgb_downsample_blocks()
        self.layout = packed_layout(size // 8, k, "mask16", geom=True)
        self._offsets = codec.rgb_crop_row_offsets(self.layout)

    def _decode_batch(self, pool: ThreadPoolExecutor, idx: np.ndarray,
                      batch_index: int = 0) -> dict:
        buf = np.zeros((self.batch_size, self.layout["row"]), np.uint8)
        labels = np.zeros((self.batch_size,), np.int32)
        weights = np.zeros((self.batch_size,), np.float32)
        rng = np.random.default_rng([self.seed, self.epoch, batch_index])
        uniforms = rng.random((self.batch_size, 22))
        ds_labels = self.dataset.labels
        ds_paths = self.dataset.paths

        def work(slot: int, ds_index: int):
            if ds_index < 0:  # shard-padding sentinel
                return
            label = int(ds_labels[ds_index])
            codec.read_rgb_crop_pack_row(
                ds_paths[ds_index], self.k, self.size // 8, self.mode_int,
                uniforms[slot], self.g2, self.g4, buf[slot], self._offsets,
                label, 1.0, scale=self.scale, resize_to=self.resize_to,
                crop=float(self.size),
            )
            labels[slot] = label
            weights[slot] = 1.0

        list(pool.map(lambda args: work(*args), enumerate(idx)))
        return {"packed": buf, "labels": labels, "weights": weights}


class RgbCanvasLoader(_BaseLoader):
    """Loads fully-decoded RGB pixels into fixed uint8 canvases (RGB domain).

    The reference decodes with PIL per worker (``datasets.py:286``); here the
    C++ codec full-decodes and augmentation happens on-device.
    """

    def __init__(self, dataset: IndexDataset, batch_size: int, image_size: int = 512, **kw):
        super().__init__(dataset, batch_size, **kw)
        self.image_size = image_size

    def _decode_batch(self, pool: ThreadPoolExecutor, idx: np.ndarray,
                      batch_index: int = 0) -> dict:
        bsz = self.batch_size
        s = self.image_size
        pixels = np.zeros((bsz, 3, s, s), np.uint8)
        labels = np.zeros((bsz,), np.int32)
        weights = np.zeros((bsz,), np.float32)

        def work(slot: int, ds_index: int):
            if ds_index < 0:  # shard-padding sentinel
                return
            img = codec.read_jpeg(self.dataset.paths[ds_index])
            ch, h, w = img.shape
            if ch == 1:
                img = np.broadcast_to(img, (3, h, w))
            hh, ww = min(h, s), min(w, s)
            pixels[slot, :, :hh, :ww] = img[:, :hh, :ww]
            labels[slot] = self.dataset.labels[ds_index]
            weights[slot] = 1.0

        list(pool.map(lambda args: work(*args), enumerate(idx)))
        return {"pixels": pixels, "labels": labels, "weights": weights}
