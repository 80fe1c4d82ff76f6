# Developer targets (parity with the reference's Makefile.test)

PY ?= python

.PHONY: test test-unit test-integration test-tpu bench verify serve clean

test:
	$(PY) -m pytest tests/ -q

test-unit:
	$(PY) -m pytest tests/ -m unit -q

test-integration:
	$(PY) -m pytest tests/ -m integration -q

test-tpu:
	DREAMLAB_TEST_TPU=1 $(PY) -m pytest tests/ -q

bench:
	$(PY) bench.py

verify:
	$(PY) -m dreamlab_tpu.utils.verify_tpu

serve:
	$(PY) -m dreamlab_tpu.serving.run

clean:
	find . -name __pycache__ -type d -exec rm -rf {} + 2>/dev/null; true
	rm -f dreamlab_tpu/native/_pngenc.so
