from stil_tta_tpu.tta.tent import adapt
