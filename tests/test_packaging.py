"""Packaging sanity: pyproject console entry points resolve to callables
(reference: setup.py:1-40 — the reference is an installable package)."""
import importlib
import pathlib
import tomllib


def test_console_entry_points_resolve():
    pyproject = pathlib.Path(__file__).parent.parent / "pyproject.toml"
    config = tomllib.loads(pyproject.read_text())
    scripts = config["project"]["scripts"]
    assert len(scripts) == 8
    for name, target in scripts.items():
        module_name, func_name = target.split(":")
        module = importlib.import_module(module_name)
        assert callable(getattr(module, func_name)), name


def test_package_metadata():
    pyproject = pathlib.Path(__file__).parent.parent / "pyproject.toml"
    config = tomllib.loads(pyproject.read_text())
    assert config["project"]["name"] == "ptgnn-tpu"
    assert "jax" in config["project"]["dependencies"]
