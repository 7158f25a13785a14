# bwtb3m_tpu developer entry points
.PHONY: test selftest bench fuzz native clean

test:
	python -m pytest tests/ -q

selftest:
	python -m bwtb3m_tpu lcpbit -test

bench:
	python bench.py

fuzz:
	python scripts/fuzz_engines.py 120

native:
	g++ -O3 -shared -fPIC -std=c++17 \
	  -o bwtb3m_tpu/native/_bwtb3m_native.so \
	  bwtb3m_tpu/native/bwtb3m_native.cpp

clean:
	rm -f bwtb3m_tpu/native/_bwtb3m_native.so
	find . -name __pycache__ -type d -exec rm -rf {} +
