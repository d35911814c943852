"""Data loader with optional threaded prefetch.

The reference uses a torch DataLoader with worker processes
(/root/reference/torbi/data/loader.py:19-25). On TPU the host-side pipeline
is a prefetching thread pool feeding the device: batches are assembled off
the critical path so file IO overlaps decoding.
"""
from concurrent.futures import ThreadPoolExecutor
from pathlib import Path

import torbi_tpu
from . import native
from .collate import collate as default_collate
from .dataset import Dataset


class DataLoader:

    def __init__(self, dataset, batch_size, num_workers=0, collate_fn=None,
                 pad_value=float('-inf'), pack=False):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        if collate_fn is None:
            def collate_fn(batch):
                return default_collate(batch, pad_value=pad_value, pack=pack)
        self.collate_fn = collate_fn

    def _batches(self):
        indices = range(len(self.dataset))
        return [
            list(indices[i:i + self.batch_size])
            for i in range(0, len(self.dataset), self.batch_size)]

    def _load_batch(self, index_batch):
        return self.collate_fn([self.dataset[i] for i in index_batch])

    def __len__(self):
        return (len(self.dataset) + self.batch_size - 1) // self.batch_size

    def __iter__(self):
        batches = self._batches()
        if self.num_workers <= 0:
            for index_batch in batches:
                yield self._load_batch(index_batch)
            return

        # Prefetch up to 2 * num_workers batches ahead
        with ThreadPoolExecutor(max_workers=self.num_workers) as pool:
            depth = 2 * self.num_workers
            futures = [
                pool.submit(self._load_batch, b) for b in batches[:depth]]
            next_submit = depth
            for i in range(len(batches)):
                yield futures[i].result()
                futures[i] = None
                if next_submit < len(batches):
                    futures.append(
                        pool.submit(self._load_batch, batches[next_submit]))
                    next_submit += 1


class NativeDataLoader:
    """Batch loader backed by the C++ threaded .npy reader (data/native.py).

    Applies when every input is .npy, chunking is disabled, and the native
    library built; the padded (batch, max_frames, states) buffer is filled
    outside the GIL. Yields the same tuples as DataLoader.
    """

    def __init__(self, input_files, batch_size, num_threads, shapes=None,
                 pad_value=float('-inf'), pack=False):
        self.pad_value = pad_value
        self.pack = pack
        self.dataset = Dataset(input_files)
        input_files = [str(f) for f in input_files]
        self.batch_size = batch_size
        self.num_threads = max(num_threads, 8)
        # Reuse shapes probed during eligibility checking; each probe is a
        # file open + header parse
        shapes = (
            shapes if shapes is not None
            else [native.probe(f) for f in input_files])
        # Batch length-sorted: every row in a batch pads to the batch max,
        # so grouping similar-length files cuts wasted decode frames on
        # heavy-tailed corpora (outputs are keyed by filename, order-free)
        order = sorted(
            range(len(input_files)), key=lambda i: shapes[i][0])
        self.input_files = [input_files[i] for i in order]
        self.shapes = [shapes[i] for i in order]
        self.segments = self._segments()

    def _segments(self):
        """Batch boundaries over the length-sorted files: capped at
        batch_size AND split wherever the frame bucket steps up, so a
        batch's rows pad only to their own bucket. One mixed-length
        512-cap batch over a 400-1600-frame corpus pads every row to the
        2048 bucket (~2x slot-frame waste). Splitting trades padded slots
        for MORE decode calls, and each call carries a fixed dispatch
        cost, so segments shorter than LOADER_SPLIT_MIN_ROWS absorb the
        next bucket instead of forming a sliver batch (None disables
        bucket splitting entirely -- one mixed batch per batch_size, the
        right shape when per-call dispatch is expensive, e.g. this
        development environment's ~4 ms/call tunnel; see
        config/defaults.py for the measured tradeoff).
        """
        from ..ops.dispatch import bucket_frames

        min_rows = getattr(torbi_tpu, 'LOADER_SPLIT_MIN_ROWS', 8)
        segments, start, count = [], 0, 0
        bucket = None
        for i, shape in enumerate(self.shapes):
            row_bucket = bucket_frames(shape[0])
            if count and (
                    count >= self.batch_size
                    or (min_rows is not None and row_bucket != bucket
                        and count >= min_rows)):
                segments.append((start, i))
                start, count = i, 0
            bucket = row_bucket
            count += 1
        if count:
            segments.append((start, len(self.shapes)))
        if min_rows is None:
            return segments
        # Power-of-two row counts: the dispatcher pads each decode batch
        # to the next power of two (bucket_batch), so an 82-row batch
        # would allocate and run 128 rows; emitting 64 + 16 + 2 instead
        # pads only the final sub-batch. Applied only when it strictly
        # reduces padded row slots (9 -> 8 + 1 is still 16 slots but two
        # dispatches; keep it whole)
        from ..ops.dispatch import bucket_batch

        subdivided = []
        for start, stop in segments:
            n = stop - start
            sizes, left = [], n
            while left > 0:
                size = 8
                while size * 2 <= min(left, self.batch_size):
                    size *= 2
                sizes.append(min(size, left))
                left -= sizes[-1]
            if sum(bucket_batch(s) for s in sizes) < bucket_batch(n):
                for size in sizes:
                    subdivided.append((start, start + size))
                    start += size
            else:
                subdivided.append((start, stop))
        return subdivided

    def __len__(self):
        return len(self.segments)

    def _load(self, segment):
        from ..ops.dispatch import bucket_frames, padded_states

        start, stop = segment
        files = self.input_files[start:stop]
        shapes = self.shapes[start:stop]
        # Bucketed frames keep host-to-device transfers tile-aligned
        # and batch shapes shared (see data/collate.py)
        max_frames = bucket_frames(max(shape[0] for shape in shapes))
        states = shapes[0][1]
        result = native.load_batch(
            files, max_frames, states, self.num_threads,
            padded_states=padded_states(states),
            pad_value=self.pad_value,
            pack=self.pack)
        if result is None:
            # File changed underneath or parse error: python fallback
            batch = [(Dataset([f])[0][0], f) for f in files]
            return default_collate(
                batch, pad_value=self.pad_value, pack=self.pack)
        observation, batch_frames = result
        return observation, batch_frames, [1] * len(files), tuple(files)

    def __iter__(self):
        # Depth-1 prefetch: the next batch's file IO (C++ threads, GIL
        # released) overlaps the consumer's device compute -- the same
        # overlap the threaded python loader gets from its pool
        from concurrent.futures import ThreadPoolExecutor

        with ThreadPoolExecutor(max_workers=1) as pool:
            pending = None
            for segment in self.segments:
                future = pool.submit(self._load, segment)
                if pending is not None:
                    yield pending.result()
                pending = future
            if pending is not None:
                yield pending.result()


def _native_eligible(input_files):
    """Probed (frames, states) per file when the native loader applies,
    else None"""
    import torbi_tpu as config
    if not (config.USE_NATIVE_LOADER
            and config.MIN_CHUNK_SIZE is None
            and len(input_files) > 0
            and all(Path(f).suffix == '.npy' for f in input_files)
            and native.available()):
        return None
    shapes = [native.probe(f) for f in input_files]
    return shapes if all(s is not None for s in shapes) else None


def loader(input_files, num_workers=None, collate_fn=None,
           pad_value=float('-inf'), pack=False):
    """Retrieve a data loader.

    pad_value fills the lane-padding of the observation's state dimension:
    -inf for log-space data (the default), 0.0 for probabilities.

    pack=True assembles batches directly in the stitched band kernel's
    mod-M PACKED layout (see data/collate.py) -- set by the file workload
    when the decode will take that path, so observations reach the kernel
    with no relayout copy on host or device.
    """
    if num_workers is None:
        num_workers = torbi_tpu.NUM_WORKERS
    if collate_fn is None:
        shapes = _native_eligible(input_files)
        if shapes is not None:
            return NativeDataLoader(
                input_files, torbi_tpu.BATCH_SIZE, num_workers,
                shapes=shapes, pad_value=pad_value, pack=pack)
    dataset = Dataset(input_files)
    return DataLoader(
        dataset,
        batch_size=torbi_tpu.BATCH_SIZE,
        num_workers=num_workers,
        collate_fn=collate_fn,
        pad_value=pad_value,
        pack=pack)
