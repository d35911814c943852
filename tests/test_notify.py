"""Webhook notification tests (the reference uses @torchutil.notify)."""
import json
import threading
from http.server import BaseHTTPRequestHandler, HTTPServer

import pytest

from torbi_tpu.utils import notify


@pytest.fixture
def webhook(monkeypatch):
    received = []

    class Handler(BaseHTTPRequestHandler):
        def do_POST(self):
            length = int(self.headers['Content-Length'])
            received.append(json.loads(self.rfile.read(length)))
            self.send_response(200)
            self.end_headers()

        def log_message(self, *args):
            pass

    server = HTTPServer(('127.0.0.1', 0), Handler)
    thread = threading.Thread(target=server.serve_forever, daemon=True)
    thread.start()
    monkeypatch.setenv(
        notify.ENV_VAR, f'http://127.0.0.1:{server.server_port}/')
    yield received
    server.shutdown()


def test_notify_unconfigured_is_noop(monkeypatch):
    monkeypatch.delenv(notify.ENV_VAR, raising=False)
    assert notify.send('hello') is False


def test_notify_on_finish_success(webhook):
    @notify.notify_on_finish('unit-job')
    def job():
        return 42

    assert job() == 42
    assert len(webhook) == 1
    assert 'unit-job finished' in webhook[0]['text']


def test_notify_on_finish_failure(webhook):
    @notify.notify_on_finish('doomed-job')
    def job():
        raise RuntimeError('boom')

    with pytest.raises(RuntimeError):
        job()
    assert len(webhook) == 1
    assert 'FAILED' in webhook[0]['text']
    assert 'boom' in webhook[0]['text']


def test_notify_survives_dead_webhook(monkeypatch):
    monkeypatch.setenv(notify.ENV_VAR, 'http://127.0.0.1:9/')
    assert notify.send('hello', timeout=1) is False
