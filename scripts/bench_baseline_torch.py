"""Measure the reference-equivalent torch-CPU Langevin throughput.

The reference repo publishes no benchmark numbers (no benchmarks/ dir; see
BASELINE.md), so the denominator for bench.py's ``vs_baseline`` is measured
here: a torch implementation of the same workload — shipped-config graph
transformer (conservative forces via autograd) driving BAOA(F)B Langevin
with parallel_sim chains, one force evaluation per step, exactly the
reference's per-step Python loop structure
(dynamics/langevin_cgnet.py:737-771). Chignolin (the north-star config) is
measured at both chain counts plus the iid reverse chain; trp_cage and
protein_g give the denominators for bench.py's other-protein rows.

Measure on an OTHERWISE IDLE host (concurrent jobs understate the baseline
and flatter the TPU ratios). Writes BASELINE_MEASURED.json at the repo
root. Run once per machine:
    python scripts/bench_baseline_torch.py
"""

import json
import math
import os
import time

import torch

HEADS, DIM_HEAD = 8, 64
PARALLEL_SIM = 100
WARMUP, TIMED = 3, 15
# The formal target configuration (BASELINE.json: ">=50x CPU-reference
# Langevin steps/sec on chignolin at parallel_sim=1000").
PARALLEL_SIM_FORMAL = 1000
WARMUP_FORMAL, TIMED_FORMAL = 1, 5
# i.i.d. sampling baseline: reference chignolin sampling batch
# (evaluate/sampling_commands.md uses batch_size 256), full T=1000 reverse
# chain = one net forward per step; samples/s extrapolates from per-step time.
IID_BATCH, IID_TIMESTEPS = 256, 1000
IID_WARMUP, IID_TIMED = 2, 6
# Shipped model shapes (SURVEY "shipped model config") for the proteins
# bench.py reports: (num_beads, hidden_nf, n_layers).
SHAPES = {
    "chignolin": (10, 64, 3),
    "trp_cage": (20, 128, 3),
    "protein_g": (56, 128, 3),
}


class Attention(torch.nn.Module):
    def __init__(self, hidden):
        super().__init__()
        inner = HEADS * DIM_HEAD
        self.to_q = torch.nn.Linear(hidden, inner)
        self.to_kv = torch.nn.Linear(hidden, 2 * inner)
        self.edges_to_kv = torch.nn.Linear(hidden, inner)
        self.to_out = torch.nn.Linear(inner, hidden)

    def forward(self, nodes, edges):
        b, n, _ = nodes.shape
        inner = HEADS * DIM_HEAD
        q = self.to_q(nodes)
        k, v = self.to_kv(nodes).chunk(2, dim=-1)
        ekv = self.edges_to_kv(edges)

        def heads(t):
            shape = t.shape[:-1]
            return t.reshape(*shape, HEADS, DIM_HEAD).movedim(-2, 1).reshape(
                b * HEADS, *shape[1:], DIM_HEAD
            )

        qh, kh, vh, eh = heads(q), heads(k), heads(v), heads(ekv)
        kfull = kh.unsqueeze(1) + eh
        vfull = vh.unsqueeze(1) + eh
        sim = torch.einsum("bid,bijd->bij", qh, kfull) * DIM_HEAD**-0.5
        attn = sim.softmax(dim=-1)
        out = torch.einsum("bij,bijd->bid", attn, vfull)
        out = out.reshape(b, HEADS, n, DIM_HEAD).movedim(1, 2).reshape(b, n, inner)
        return self.to_out(out)


class Block(torch.nn.Module):
    def __init__(self, hidden):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(hidden)
        self.attn = Attention(hidden)
        self.gate1 = torch.nn.Linear(3 * hidden, 1, bias=False)
        self.norm2 = torch.nn.LayerNorm(hidden)
        self.ff = torch.nn.Sequential(
            torch.nn.Linear(hidden, 4 * hidden), torch.nn.GELU(),
            torch.nn.Linear(4 * hidden, hidden),
        )
        self.gate2 = torch.nn.Linear(3 * hidden, 1, bias=False)

    def forward(self, nodes, edges):
        a = self.attn(self.norm1(nodes), edges)
        g = torch.sigmoid(self.gate1(torch.cat((a, nodes, a - nodes), -1)))
        nodes = a * g + nodes * (1 - g)
        f = self.ff(self.norm2(nodes))
        g = torch.sigmoid(self.gate2(torch.cat((f, nodes, f - nodes), -1)))
        return f * g + nodes * (1 - g)


class ScoreNet(torch.nn.Module):
    """Shipped config: intrinsic coords, conservative energies."""

    def __init__(self, n_beads, hidden, layers):
        super().__init__()
        self.n_beads = n_beads
        self.node_embedding = torch.nn.Linear(n_beads + 1, hidden)
        self.edge_embedding = torch.nn.Linear(3, hidden)
        self.blocks = torch.nn.ModuleList([Block(hidden) for _ in range(layers)])
        self.node_decoder = torch.nn.Linear(hidden, 1)

    def forward(self, x, t):
        x = x - x.mean(dim=1, keepdim=True)
        x = x.detach().requires_grad_(True)
        b, n, _ = x.shape
        diff = x.unsqueeze(1) - x.unsqueeze(2)
        edges = self.edge_embedding(diff)
        onehot = torch.eye(n).unsqueeze(0).expand(b, n, n)
        tfeat = t.reshape(-1, 1, 1).expand(b, n, 1)
        nodes = self.node_embedding(torch.cat((onehot, tfeat), -1))
        for blk in self.blocks:
            nodes = blk(nodes, edges)
        energy = self.node_decoder(nodes)
        forces = -torch.autograd.grad(energy.sum(), x)[0]
        return forces


def measure_langevin(net, parallel_sim, warmup, timed):
    x = torch.randn(parallel_sim, net.n_beads, 3)
    v = torch.zeros_like(x)
    dt, friction, mass, kbt = 2e-3, 1.0, 12.0, 0.1
    vscale = math.exp(-dt * friction)
    noisescale = math.sqrt(1 - vscale * vscale)
    t_norm = torch.full((parallel_sim,), 0.02)

    def step(x, v):
        x = x - x.mean(dim=1, keepdim=True)
        forces = net(x, t_norm)
        v = v + dt * forces / mass
        x = x + v * dt / 2
        v = v * vscale + noisescale * math.sqrt(kbt / mass) * torch.randn_like(v)
        x = x + v * dt / 2
        return x.detach(), v.detach()

    for _ in range(warmup):
        x, v = step(x, v)
    t0 = time.perf_counter()
    for _ in range(timed):
        x, v = step(x, v)
    elapsed = time.perf_counter() - t0
    return timed / elapsed


def measure_iid(net):
    """Reverse-chain sampling rate: one score-net call per timestep
    (reference models/ddpm.py p_sample loop) + O(B*N) coefficient math that
    is negligible next to the net forward; samples/s = B / (T * per_step)."""
    x = torch.randn(IID_BATCH, net.n_beads, 3)

    def rev_step(x, t_val):
        t_norm = torch.full((IID_BATCH,), t_val)
        eps = net(x, t_norm)
        return (x - 0.01 * eps).detach()

    for i in range(IID_WARMUP):
        x = rev_step(x, 0.999)
    t0 = time.perf_counter()
    for i in range(IID_TIMED):
        x = rev_step(x, 1.0 - i / IID_TIMESTEPS)
    per_step = (time.perf_counter() - t0) / IID_TIMED
    return IID_BATCH / (IID_TIMESTEPS * per_step)


def main():
    torch.manual_seed(0)
    n, nf, layers = SHAPES["chignolin"]
    net = ScoreNet(n, nf, layers).eval()

    steps_per_sec = measure_langevin(net, PARALLEL_SIM, WARMUP, TIMED)
    steps_per_sec_formal = measure_langevin(
        net, PARALLEL_SIM_FORMAL, WARMUP_FORMAL, TIMED_FORMAL
    )
    iid_samples_per_sec = measure_iid(net)

    out = {
        "langevin_steps_per_sec_cpu_torch": steps_per_sec,
        "langevin_steps_per_sec_cpu_torch_parallel1000": steps_per_sec_formal,
        "iid_samples_per_sec_cpu_torch": iid_samples_per_sec,
        "config": {
            "mol": "chignolin", "parallel_sim": PARALLEL_SIM,
            "parallel_sim_formal": PARALLEL_SIM_FORMAL,
            "iid_batch": IID_BATCH, "iid_timesteps": IID_TIMESTEPS,
            "hidden_nf": nf, "n_layers": layers, "conservative": True,
            "device": "cpu", "torch": torch.__version__,
        },
    }
    # Denominators for bench.py's other-protein rows (timed budgets shrink
    # with the per-step cost; still >=1 min of steady-state each).
    for mol, (warm, timed) in (("trp_cage", (1, 4)), ("protein_g", (1, 2))):
        n, nf, layers = SHAPES[mol]
        net = ScoreNet(n, nf, layers).eval()
        out[f"langevin_steps_per_sec_cpu_torch_{mol}_parallel1000"] = (
            measure_langevin(net, PARALLEL_SIM_FORMAL, warm, timed)
        )
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
