from stil_tta_tpu.algorithms import registry

get_algorithm = registry.get_algorithm
