"""Preprocess audio into pitch posteriorgrams with penn
(reference: torbi/data/preprocess/core.py). penn is an optional dependency.
"""
import numpy as np

import torbi_tpu
from ...utils import io, progress
from ...utils.notify import notify_on_finish


@notify_on_finish('preprocess')
def datasets(datasets=None, gpu=None):
    """Preprocess datasets: audio -> log-softmax pitch posteriorgram .pt"""
    if datasets is None:
        datasets = torbi_tpu.DATASETS
    try:
        import penn
        import torch
    except ImportError as error:
        raise ImportError(
            'penn is required for preprocessing; install the evaluate '
            'extras') from error

    for dataset in datasets:
        directory = torbi_tpu.CACHE_DIR / dataset
        files = sorted(directory.rglob('*.wav'))
        for file in progress.iterator(files, f'preprocess/{dataset}'):
            import torchaudio
            audio, sample_rate = torchaudio.load(file)

            # Infer pitch posteriorgram (reference preprocess/core.py:29-53)
            logits = []
            for frames in penn.preprocess(
                audio,
                sample_rate,
                batch_size=2048,
                center='half-hop'
            ):
                frames = frames.to(
                    'cpu' if gpu is None else f'cuda:{gpu}')
                logits.append(penn.infer(frames).detach().cpu())
            logits = torch.cat(logits, dim=0).squeeze(2)
            observation = torch.nn.functional.log_softmax(logits, dim=1)
            io.save(
                observation.numpy(), file.with_suffix('.pt'))
