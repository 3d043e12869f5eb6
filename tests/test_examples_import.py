"""Every example module imports and exposes a runnable entry (catches API
drift between the framework and the example zoo without paying full runs)."""

import importlib
import pathlib
import sys

import pytest

EXAMPLES = sorted(
    p.stem for p in (pathlib.Path(__file__).parent.parent / "examples").glob("*.py")
    if not p.stem.startswith("_")  # helpers (_runner, _ldc_common) are not cases
)


@pytest.mark.parametrize("name", EXAMPLES)
def test_example_imports(name):
    sys.path.insert(0, str(pathlib.Path(__file__).parent.parent / "examples"))
    try:
        mod = importlib.import_module(name)
    finally:
        sys.path.pop(0)
    assert any(hasattr(mod, fn) for fn in ("build_solver", "main", "train", "main_cli", "run", "build_forward")), (
        f"example {name} should expose a build/run entrypoint")
