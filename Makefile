# Build / test / bench entry points (reference Makefile analogue).
# The TPU compute path needs no build step (jit-compiled); `native` builds
# the C++ host-side components (K-quant encoder, trie tokenizer).

NATIVE_DIR := deepseek_tpu/native
BUILD_DIR := $(NATIVE_DIR)/_build
CXX ?= g++
CXXFLAGS := -O3 -std=c++17 -shared -fPIC -fopenmp -march=native

.PHONY: all native test tpu-smoke bench clean

all: native

native: $(BUILD_DIR)/libdseek_kquant.so $(BUILD_DIR)/libdseek_tokenizer.so

$(BUILD_DIR)/libdseek_kquant.so: $(NATIVE_DIR)/kquant.cpp
	@mkdir -p $(BUILD_DIR)
	$(CXX) $(CXXFLAGS) $< -o $@

$(BUILD_DIR)/libdseek_tokenizer.so: $(NATIVE_DIR)/tokenizer.cpp
	@mkdir -p $(BUILD_DIR)
	$(CXX) $(CXXFLAGS) $< -o $@

test:
	python -m pytest tests/ -q

tpu-smoke:
	python scripts/tpu_smoke.py

bench:
	python bench.py

membench:
	python scripts/membench.py

clean:
	rm -rf $(BUILD_DIR)
