from stablediffusion_tpu.models.wrapper import SDModel
