"""JSON / YAML / pickle-metrics IO (reference common.py:37-82)."""

from __future__ import annotations

import json
import pickle


def load_json(json_path):
    with open(json_path) as f:
        return json.load(f)


def save_json(obj, save_path) -> None:
    with open(save_path, "w") as out:
        json.dump(obj, out)


def load_yaml(filepath):
    import yaml
    with open(filepath) as stream:
        return yaml.safe_load(stream)


def save_metrics(metrics, filename) -> None:
    with open(filename, "wb") as fid:
        pickle.dump(metrics, fid)


def load_metrics(filename):
    with open(filename, "rb") as f:
        return pickle.load(f)
