"""Minimal ``toml`` shim over stdlib ``tomllib`` (the reference only calls
``toml.load`` in its version fallback, eks/__init__.py:52-58)."""

import tomllib


def load(path_or_file):
    if hasattr(path_or_file, "read"):
        data = path_or_file.read()
        if isinstance(data, str):
            data = data.encode()
        return tomllib.loads(data.decode())
    with open(path_or_file, "rb") as f:
        return tomllib.load(f)


def loads(s: str):
    return tomllib.loads(s)
