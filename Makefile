# Build + check entry points (the reference ships per-variant Makefiles with a
# `check` target, e.g. MPI/Makefile:21-22; here one Makefile covers the repo).

CXX ?= g++
CXXFLAGS ?= -O3 -std=c++17 -fPIC -Wall -Wextra
NATIVE_DIR := native
NATIVE_BUILD := $(NATIVE_DIR)/build
NATIVE_LIB := $(NATIVE_BUILD)/liblbmio.so

.PHONY: all native test check check-all perfcheck verify clean

all: native

native: $(NATIVE_LIB)

$(NATIVE_LIB): $(NATIVE_DIR)/lbmio.cpp
	mkdir -p $(NATIVE_BUILD)
	$(CXX) $(CXXFLAGS) -shared -o $@ $<

test:
	python -m pytest tests/ -x -q

# Run the 128x128 scene end-to-end and validate against the reference golden
# data at 1% tolerance (the reference's `make check` contract).
check: native
	python -m lbm_tpu run /root/reference/dataSet/input_128x128.params \
	    /root/reference/dataSet/obstacles_128x128.dat
	python -m lbm_tpu.tools.check \
	    --ref-av-vels-file /root/reference/check/128x128.av_vels.dat \
	    --ref-final-state-file /root/reference/check/128x128.final_state.dat \
	    --av-vels-file av_vels.dat --final-state-file final_state.dat

# Full validation: run every reference scene end-to-end on the attached
# accelerator and check against all golden data the mirror provides.
check-all: native
	bash scripts/check_all.sh

# Perf regression gate: one quick bench per kernel path, conservative floors
perfcheck:
	python -m lbm_tpu.tools.perfcheck

# On-device correctness artifact: kernel-path bitwise probes + a golden
# prefix run on the attached accelerator, recorded in VERIFY_TPU.json
# (also run automatically by bench.py each round).
verify:
	python -m lbm_tpu.tools.verify_device

clean:
	rm -rf $(NATIVE_BUILD)
