.PHONY: test bench native clean smoke

test:
	python -m pytest tests/ -x -q

native:
	$(MAKE) -C stil_tta_tpu/data/native

bench:
	python bench.py

smoke:
	python run.py --config-name config_dvm_STiL dataset=synthetic_dvm \
	  models=resnet18 batch_size=16 unlabelled_ratio=3 img_size=32 \
	  synthetic_image_size=40 max_epochs=2 start_epoch=0 num_classes=4 \
	  tabular_embedding_dim=32 multimodal_embedding_dim=32 \
	  tabular_transformer_num_layers=1 projection_dim=8 tta=false \
	  strict_prototypes=false logdir=runs/smoke

clean:
	rm -rf runs .pytest_cache
	$(MAKE) -C stil_tta_tpu/data/native clean
