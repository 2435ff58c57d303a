# Developer entry points (reference analog: Makefile:11-35, which drives
# wheel/test/format through CMake + torch; here the native piece is the
# ctypes runtime and the compute path needs no build step).

PY ?= python

.PHONY: test bench native wheel docs clean

test:
	$(PY) -m pytest tests/ -x -q

bench:
	$(PY) bench.py

native:
	$(MAKE) -C hpc_ops_tpu/runtime

wheel: native
	$(PY) -m pip wheel --no-build-isolation --no-deps -w dist .

docs:
	$(PY) docs/generate_api.py

clean:
	$(MAKE) -C hpc_ops_tpu/runtime clean
	rm -rf dist build *.egg-info
