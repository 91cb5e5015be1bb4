.PHONY: test test-slow bench lint build docs clean

test:
	python -m pytest tests/ -q

# Two process shards: a jaxlib 0.9 bug segfaults in XLA:CPU
# executable.serialize() (persistent-cache write) late in a single
# long-running process — deterministic at the same test, absent when the
# suite is split.  Sharding bounds process lifetime and the blast radius.
test-slow:
	python -m pytest $$(ls tests/test_*.py | awk 'NR % 2 == 1') -q --run-slow
	python -m pytest $$(ls tests/test_*.py | awk 'NR % 2 == 0') -q --run-slow

bench:
	python bench.py

native:
	sh native/build.sh

lint:
	python -m compileall -q pyfocusr_tpu

# --no-build-isolation: zero-egress environments cannot resolve the
# setuptools build dependency from pypi; the host interpreter already has it.
build:
	python -m pip wheel . -w dist --no-deps --no-build-isolation

docs:
	python -m pydoc -w pyfocusr_tpu

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
