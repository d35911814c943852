"""Data loader with optional threaded prefetch.

The reference uses a torch DataLoader with worker processes
(/root/reference/torbi/data/loader.py:19-25). On TPU the host-side pipeline
is a prefetching thread pool feeding the device: batches are assembled off
the critical path so file IO overlaps decoding.
"""
from concurrent.futures import ThreadPoolExecutor

import torbi_tpu
from .collate import collate as default_collate
from .dataset import Dataset


class DataLoader:

    def __init__(self, dataset, batch_size, num_workers=0, collate_fn=None):
        self.dataset = dataset
        self.batch_size = batch_size
        self.num_workers = num_workers
        self.collate_fn = collate_fn or default_collate

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


def loader(input_files, num_workers=None, collate_fn=None):
    """Retrieve a data loader"""
    if num_workers is None:
        num_workers = torbi_tpu.NUM_WORKERS
    dataset = Dataset(input_files)
    return DataLoader(
        dataset,
        batch_size=torbi_tpu.BATCH_SIZE,
        num_workers=num_workers,
        collate_fn=collate_fn)
