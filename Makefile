# Workflow layer — the real CLI, encoding dataset paths + hyperparameter
# presets (role parity: ref Makefile:9-385). Paths come from the env
# contract DATA_DIR / SAVE_DIR / CACHE_DIR (ref: config.sh:27-34).

PY ?= python
DATA_DIR ?= ./data
SAVE_DIR ?= ./outputs
CACHE_DIR ?= ./cache
MODEL_NAME ?= dptpu-model
DUMP_DIR ?= $(SAVE_DIR)/$(MODEL_NAME)_dump
NUM_CLUSTERS ?= 1024
FINE_QUANT ?= OPQ96
TOPK ?= 10

export DATA_DIR SAVE_DIR CACHE_DIR

.PHONY: test draft train-rc gen-vecs index-vecs eval-index serve bench clean-draft

# fast gate (~6 min): unit + component tests. `make test-all` is the FULL
# gate — it adds the heavy integration suites (cli pipeline, end-to-end,
# acceptance, golden activations, two-process serve; ~10 extra min on the
# forced-CPU mesh) and is what CI / the verify skill must run before a
# release: regressions in those paths are invisible to plain `make test`.
test:
	$(PY) -m pytest tests/ -q -m "not slow"

test-all:
	$(PY) -m pytest tests/ -q

# ---- per-stage targets (ref Makefile:81-230) --------------------------------

train-rc:
	$(PY) -m densephrases_tpu.cli.train_rc \
	  --train_file $(DATA_DIR)/$(TRAIN_FILE) \
	  --output_dir $(SAVE_DIR)/$(MODEL_NAME) \
	  --lambda_neg 2.0 --lambda_flt 1.0 $(ARGS)

gen-vecs:
	$(PY) -m densephrases_tpu.cli.generate_phrase_vecs \
	  --load_dir $(SAVE_DIR)/$(MODEL_NAME) \
	  --data_dir $(DATA_DIR)/$(CORPUS_DIR) \
	  --predict_file $(PREDICT_FILE) \
	  --dump_dir $(DUMP_DIR) --index_filter 1.0 $(ARGS)

index-vecs:
	$(PY) -m densephrases_tpu.cli.build_phrase_index \
	  --dump_dir $(DUMP_DIR) \
	  --num_clusters $(NUM_CLUSTERS) --fine_quant $(FINE_QUANT) $(ARGS)

eval-index:
	$(PY) -m densephrases_tpu.cli.eval_phrase_retrieval \
	  --load_dir $(SAVE_DIR)/$(MODEL_NAME) \
	  --dump_dir $(DUMP_DIR) \
	  --index_name start/$(NUM_CLUSTERS)_flat_$(FINE_QUANT) \
	  --test_path $(DATA_DIR)/$(TEST_FILE) --top_k $(TOPK) $(ARGS)

train-query:
	$(PY) -m densephrases_tpu.cli.train_query \
	  --load_dir $(SAVE_DIR)/$(MODEL_NAME) \
	  --dump_dir $(DUMP_DIR) \
	  --index_name start/$(NUM_CLUSTERS)_flat_$(FINE_QUANT) \
	  --test_path $(DATA_DIR)/$(TRAIN_FILE) \
	  --dev_file $(DATA_DIR)/$(DEV_FILE) \
	  --output_dir $(SAVE_DIR)/$(MODEL_NAME)-qft $(ARGS)

serve:
	$(PY) -m densephrases_tpu.cli.run_demo --demo_mode single_serve \
	  --load_dir $(SAVE_DIR)/$(MODEL_NAME) --dump_dir $(DUMP_DIR) \
	  --index_name start/$(NUM_CLUSTERS)_flat_$(FINE_QUANT) $(ARGS)

bench:
	$(PY) bench.py

# ---- draft: ~minutes end-to-end smoke on the bundled sample -----------------
# (ref Makefile:184-202 `make draft`)
DRAFT_WS := /tmp/dptpu_draft

draft:
	$(PY) -m pytest tests/test_cli_pipeline.py -q

clean-draft:
	rm -rf $(DRAFT_WS)
