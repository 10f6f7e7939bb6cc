PYTHON ?= python

.PHONY: test bench native clean lint

test:
	$(PYTHON) -m pytest tests/ -q

bench:
	$(PYTHON) bench.py

native:
	$(MAKE) -C tpuslam/native

clean:
	$(MAKE) -C tpuslam/native clean
	find . -name __pycache__ -type d -exec rm -rf {} +
