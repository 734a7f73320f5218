import numpy as np, jax, jax.numpy as jnp
from densephrases_tpu.models.bert import BertConfig
from densephrases_tpu.models.encoder import RCLossConfig, init_encoder_params
from densephrases_tpu.train.rc import create_train_state, make_optimizer, make_train_step

config = BertConfig()
params = init_encoder_params(jax.random.PRNGKey(0), config)
rng = np.random.default_rng(0)
bt, l, lq = 24, 384, 32
opt = make_optimizer(lr=1e-4, warmup_steps=10, total_steps=100)
state = create_train_state(params, opt, pbn_size=2, batch_size=bt, hidden=config.hidden_size)
batch = {
    "input_ids": jnp.asarray(rng.integers(5, 1000, (bt, l)), jnp.int32),
    "attention_mask": jnp.ones((bt, l), jnp.int32),
    "token_type_ids": jnp.zeros((bt, l), jnp.int32),
    "query_input_ids": jnp.asarray(rng.integers(5, 1000, (bt, lq)), jnp.int32),
    "query_attention_mask": jnp.ones((bt, lq), jnp.int32),
    "query_token_type_ids": jnp.zeros((bt, lq), jnp.int32),
    "start_positions": jnp.asarray(rng.integers(1, l - 1, (bt,)), jnp.int32),
    "end_positions": jnp.asarray(rng.integers(1, l - 1, (bt,)), jnp.int32),
}
step = make_train_step(config, RCLossConfig(lambda_neg=1.0, lambda_flt=1.0), opt, remat="full")
import traceback, time
try:
    t0=time.perf_counter()
    s2, m = step(state, batch, jax.random.PRNGKey(0))
    jax.block_until_ready(s2.params["filter"]["b"])
    print("compile+first step ok", time.perf_counter()-t0)
    t0=time.perf_counter()
    for _ in range(4):
        s2, m = step(s2, batch, jax.random.PRNGKey(0))
    float(jax.device_get(s2.params["filter"]["b"])[0])  # value fetch: cannot lie
    print("step ms (device_get):", (time.perf_counter()-t0)/4*1000)
    t0=time.perf_counter()
    for _ in range(4):
        s2, m = step(s2, batch, jax.random.PRNGKey(0))
        float(jax.device_get(m["loss"]))
    print("step ms (per-step loss fetch):", (time.perf_counter()-t0)/4*1000)
except Exception as e:
    traceback.print_exc()
