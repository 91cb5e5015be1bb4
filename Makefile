.PHONY: test test-slow bench lint build docs clean

# warm-cache first: conftest disables persistent-cache WRITES inside
# pytest (a jaxlib XLA:CPU executable.serialize() segfault fires late in
# long-lived processes); the short-lived warmer pre-populates the cache
# for the heavy golden-gate programs so they never compile under pytest.
# Two process shards for the READ-path sibling of the same upstream bug:
# cache deserialization also segfaults late in long-lived processes
# (observed at ~70% of the unsharded suite in compilation_cache.
# get_executable_and_time with 128 GB free — not memory pressure), while
# every shard passes in isolation.  Sharding bounds process lifetime.
test: warm-cache
	python -m pytest $$(ls tests/test_*.py | awk 'NR % 2 == 1') -q
	python -m pytest $$(ls tests/test_*.py | awk 'NR % 2 == 0') -q

warm-cache:
	python tools/warm_test_cache.py

# Two process shards: bounds process lifetime for the same jaxlib bug
# (belt on top of the conftest write-disable suspenders) and halves the
# peak memory of the slow 15k/multires gates.
test-slow: warm-cache
	python -m pytest $$(ls tests/test_*.py | awk 'NR % 2 == 1') -q --run-slow
	python -m pytest $$(ls tests/test_*.py | awk 'NR % 2 == 0') -q --run-slow

bench:
	python bench.py

native:
	sh native/build.sh

# Offline lint gate: this dev image bakes no linters and cannot install
# any, so tools/lint_lite.py enforces the pyflakes/pycodestyle rules that
# CI's `ruff check` (pyproject [tool.ruff.lint]) runs with — the two
# gates select the same rules and agree.
lint:
	python -m compileall -q pyfocusr_tpu
	python tools/lint_lite.py

# --no-build-isolation: zero-egress environments cannot resolve the
# setuptools build dependency from pypi; the host interpreter already has it.
build:
	python -m pip wheel . -w dist --no-deps --no-build-isolation

# Generated per-module HTML API tree (docs/api/ — the reference ships the
# pdoc equivalent in its docs/); plus the handwritten guides in docs/.
docs:
	python tools/make_api_docs.py

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
