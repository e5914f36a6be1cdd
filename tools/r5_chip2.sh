#!/bin/bash
# Round-5 chip session 2: AOT re-probe, transposed-kernel constants,
# tvisit-vs-visit A/B on the captured 1080p d1 stream, textured RMSE.
# Sequential — ONE axon client at a time (STATUS.md operational notes).
cd /root/repo
echo "=== AOT re-probe (VERDICT r4 #9) $(date) ==="
PALLAS_AXON_REMOTE_COMPILE=0 timeout 900 python - <<'EOF'
import jax, jax.numpy as jnp
try:
    out = jax.jit(lambda x: (x * 2 + 1).sum())(jnp.ones((256, 256)))
    print("AOT probe: client-side compile OK:", float(out))
except Exception as e:
    print("AOT probe: still blocked:", type(e).__name__,
          str(e).splitlines()[0][:160])
EOF
echo "=== r5_tkernel_micro $(date) ==="
timeout 5400 python tools/r5_tkernel_micro.py --nb 2048 --ks 32 --steps 8,32,128
echo "=== r5_tvisit_ab $(date) ==="
timeout 5400 python tools/r5_tvisit_ab.py
echo "=== done $(date) ==="
