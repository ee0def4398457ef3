"""Direct TPU repro of the fused_group_update Mosaic crash (VERDICT item 1)."""
import jax, jax.numpy as jnp
from deepqlearning_tpu.models.chain import Chain, Dense, Flatten
from deepqlearning_tpu.models.dueling import DuelingNetwork, create_dueling_network
from deepqlearning_tpu.ops.pallas.fused_update import plan_for, fused_group_update

print("backend:", jax.default_backend())
key = jax.random.PRNGKey(0)
# bench shapes: U=8, B=512, dueling 2->64->64->4
net = create_dueling_network(Chain((Flatten(), Dense(2, 64, jnp.tanh), Dense(64, 64, jnp.tanh), Dense(64, 4, None))))
params = net.init(key)
plan = plan_for(net)
print("plan:", plan is not None)
U, B, A, D = 8, 512, 4, 2
m = jax.tree.map(jnp.zeros_like, params)
v = jax.tree.map(jnp.zeros_like, params)
count = jnp.asarray(0, jnp.int32)
ks = jax.random.split(key, 8)
obs_cat = jax.random.normal(ks[0], (U, 2 * B, D))
action = jax.random.randint(ks[1], (U, B), 0, A)
reward = jax.random.normal(ks[2], (U, B))
done = (jax.random.uniform(ks[3], (U, B)) < 0.1).astype(jnp.float32)
weights = jnp.ones((U, B))
q_sp_tgt = jax.random.normal(ks[4], (U, B, A))
out = fused_group_update(net, plan, params, m, v, count, obs_cat, action,
                         reward, done, weights, q_sp_tgt,
                         gamma=0.99, double_q=True, lr=1e-3, alpha=0.6,
                         eps=1e-6, batch_size=B, interpret=False)
jax.block_until_ready(out[0])
print("OK loss=", float(out[6]), "gnorm=", float(out[7]))
