"""Minimal yapecs-compatible configuration system.

The reference uses yapecs (`/root/reference/torbi/__init__.py:7-17`): every
uppercase constant in ``config/defaults.py`` is promoted to a module-level
attribute of the package, and ``--config path.py`` on the command line
composes override files. yapecs is not a dependency here; this module
implements the same contract in ~60 lines.
"""
import importlib.util
import sys
from pathlib import Path


def _load_module_from_path(path):
    path = Path(path)
    name = f'_torbi_tpu_config_{path.stem}'
    spec = importlib.util.spec_from_file_location(name, path)
    if spec is None or spec.loader is None:
        # Surface a clear error instead of an AttributeError deep inside
        # importlib: --config takes a path to a .py override file
        # (yapecs semantics), not a bare configuration name
        raise FileNotFoundError(
            f'--config expects a Python override file, got {path!r} '
            '(not a loadable .py path)')
    module = importlib.util.module_from_spec(spec)
    sys.modules[name] = module
    spec.loader.exec_module(module)
    return module


def _config_files_from_argv():
    """Extract --config file arguments from the command line (yapecs style)"""
    files = []
    argv = sys.argv
    i = 0
    while i < len(argv):
        if argv[i] == '--config':
            j = i + 1
            while j < len(argv) and not argv[j].startswith('--'):
                files.append(argv[j])
                j += 1
            i = j
        else:
            i += 1
    return files


def configure(module_name, defaults):
    """Apply --config overrides onto the defaults module (yapecs semantics).

    The package's ``from .config.defaults import *`` then re-exports the
    overridden values, so overrides must land on the defaults module itself,
    not the package.
    """
    package = sys.modules[module_name]

    # Compose overrides from --config files. Config files may
    # ``import torbi_tpu`` and check ``hasattr(torbi_tpu, 'defaults')`` /
    # ``CONFIGURING`` exactly as reference configs do with torbi
    # (reference: config/hyper.py:9).
    for file in _config_files_from_argv():
        setattr(package, 'CONFIGURING', True)
        try:
            override = _load_module_from_path(file)
        finally:
            setattr(package, 'CONFIGURING', None)
        for key in dir(override):
            if not key.startswith('_') and key.isupper():
                setattr(defaults, key, getattr(override, key))


class ArgumentParser:
    """argparse.ArgumentParser that tolerates (and swallows) --config args"""

    def __new__(cls, *args, **kwargs):
        import argparse

        parser = argparse.ArgumentParser(*args, **kwargs)
        parser.add_argument(
            '--config',
            nargs='*',
            default=[],
            help='Configuration override files')
        original_parse_args = parser.parse_args
        original_parse_known_args = parser.parse_known_args

        def parse_args(*a, **k):
            namespace = original_parse_args(*a, **k)
            del namespace.config
            return namespace

        def parse_known_args(*a, **k):
            namespace, rest = original_parse_known_args(*a, **k)
            del namespace.config
            return namespace, rest

        parser.parse_args = parse_args
        parser.parse_known_args = parse_known_args
        return parser
