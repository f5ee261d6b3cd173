# Developer entry points. `make check` is the pre-commit gate: lint + the
# full CPU-mesh test suite (the same environment the driver's dryrun uses).
PY ?= python

.PHONY: check lint test test-fast

check: lint test

lint:
	$(PY) tools/lint.py

test:
	$(PY) -m pytest tests/ -q

test-fast:
	$(PY) -m pytest tests/ -q -m "not slow"
