"""Completion notifications for long-running jobs.

The reference decorates its long jobs with ``@torchutil.notify(...)``
(/root/reference/torbi/data/preprocess/core.py:12, download/core.py:18),
which pushes a message through a user-configured service when the job
finishes or dies. The equivalent here is webhook-based and dependency-free:
set ``TORBI_TPU_NOTIFY_URL`` to any HTTP endpoint (Slack webhook, ntfy.sh
topic, ...) and every ``@notify_on_finish``-wrapped job POSTs a short JSON
message on completion and on failure. Unset, notifications are a no-op.
"""
import functools
import json
import os
import time
import urllib.request

ENV_VAR = 'TORBI_TPU_NOTIFY_URL'


def send(message, timeout=10):
    """POST a message to the configured webhook; silently no-op when
    unconfigured, never raises (a dead webhook must not kill a day-long
    job at the finish line)."""
    url = os.environ.get(ENV_VAR)
    if not url:
        return False
    try:
        payload = json.dumps({'text': message}).encode()
        request = urllib.request.Request(
            url, data=payload,
            headers={'Content-Type': 'application/json'})
        urllib.request.urlopen(request, timeout=timeout)
        return True
    except Exception:
        return False


def notify_on_finish(description):
    """Decorator: notify when the wrapped job completes or raises
    (reference: @torchutil.notify('preprocess'))."""
    def decorator(fn):
        @functools.wraps(fn)
        def wrapped(*args, **kwargs):
            start = time.time()
            try:
                result = fn(*args, **kwargs)
            except Exception as error:
                send(f'torbi_tpu: {description} FAILED after '
                     f'{time.time() - start:.0f}s: '
                     f'{type(error).__name__}: {error}')
                raise
            send(f'torbi_tpu: {description} finished in '
                 f'{time.time() - start:.0f}s')
            return result
        return wrapped
    return decorator
