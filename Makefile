.PHONY: test test-slow bench lint build docs clean

test:
	python -m pytest tests/ -q

test-slow:
	python -m pytest tests/ -q --run-slow

bench:
	python bench.py

native:
	sh native/build.sh

lint:
	python -m compileall -q pyfocusr_tpu

build:
	python -m pip wheel . -w dist --no-deps

docs:
	python -m pydoc -w pyfocusr_tpu

clean:
	rm -rf build dist *.egg-info .pytest_cache
	find . -name __pycache__ -type d -exec rm -rf {} +
