# Common entry points (see docs/STATUS.md for the round summary).

.PHONY: test bench train-synth eval profile parity native

test:
	python -m pytest tests/ -q

native:           ## build the C++ data plane (JPEG decode + crop pre-stage)
	python -c "from probpose_pytorch_tpu import native; assert native.native_available(), native._build_error; print('native data plane ready')"

bench:            ## one-chip serving throughput (real TPU)
	python bench.py

train-synth:      ## smoke-train the flagship on synthetic data
	python -m probpose_pytorch_tpu.train.cli runs/synth --dataset-format synthetic --max-steps 200

profile:          ## component-level timing on the chip
	python scripts/profile_bench.py

parity:           ## on-hardware decode-parity checks
	python scripts/verify_decode_tpu.py && python scripts/parity_sweep.py
