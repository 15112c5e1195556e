"""Config system: executable-python configs with falsy-missing-attribute access.

Same user-facing semantics as the reference config system (MFT/config.py:7-71):

- ``Config`` objects return an empty, falsy ``Config`` for missing attributes,
  so ``cfg.foo.bar.baz`` never raises and is False when unset;
- config files are plain .py files exposing ``get_config() -> Config`` and are
  loaded by path via importlib;
- ``merge`` overlays another config;
- ``config_file_from_template`` substitutes ``___placeholder_<key>___`` markers.
"""

import importlib.util
import logging
import re
from pathlib import Path

logger = logging.getLogger(__name__)


class Config:
    """Attribute bag whose missing attributes read as falsy empty Configs."""

    def __getattr__(self, name):
        # only called when the attribute is NOT found normally
        return Config()

    def __bool__(self):
        return False

    def merge(self, other, update_dicts=False):
        for key, value in other.__dict__.items():
            if key in self.__dict__:
                ours = getattr(self, key)
                if update_dicts and isinstance(ours, dict) and isinstance(value, dict):
                    ours.update(value)
                else:
                    logger.debug("Rewriting config key [%s] (%r -> %r)",
                                 key, ours, value)
                    setattr(self, key, value)
            else:
                setattr(self, key, value)

    def __repr__(self):
        return repr(self.__dict__)

    def __eq__(self, other):
        if isinstance(other, self.__class__):
            return self.__dict__ == other.__dict__
        return False


def cfg_value(value, default):
    """Missing-vs-falsy config reads: ``cfg.key or default`` swallows an
    EXPLICIT falsy setting (0, 0.0, False). Treat only the empty ``Config``
    a missing attribute returns (or None) as missing.
    """
    if value is None or isinstance(value, Config):
        return default
    return value


def load_config(path):
    """Load a .py config file by path and return its ``get_config()`` result."""
    path = Path(path)
    assert path.exists(), f"config {path} does not exist!"
    spec = importlib.util.spec_from_file_location("mft_tpu_loaded_config", path)
    module = importlib.util.module_from_spec(spec)
    spec.loader.exec_module(module)
    return module.get_config()


def config_file_from_template(path, out_path=None, **kwargs):
    """Fill ``___placeholder_<key>___`` markers in a config template."""
    path = Path(path)
    assert path.exists(), f"config {path} does not exist!"
    contents = path.read_text()
    for key, value in kwargs.items():
        contents = re.sub(f"___placeholder_{key}___", str(value), contents)
    if out_path is not None:
        out_path = Path(out_path)
        out_path.parent.mkdir(parents=True, exist_ok=True)
        out_path.write_text(contents)
    return contents
