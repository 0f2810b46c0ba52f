"""Measure the reference-equivalent torch-CPU Langevin throughput.

The reference repo publishes no benchmark numbers (no benchmarks/ dir; see
BASELINE.md), so the denominator for bench.py's ``vs_baseline`` is measured
here: a torch implementation of the same workload — chignolin-config graph
transformer (nf=64, 3 layers, conservative forces via autograd) driving
BAOA(F)B Langevin with parallel_sim chains, one force evaluation per step,
exactly the reference's per-step Python loop structure
(dynamics/langevin_cgnet.py:737-771).

Writes BASELINE_MEASURED.json at the repo root. Run once per machine:
    python scripts/bench_baseline_torch.py
"""

import json
import math
import os
import time

import torch
import torch.nn.functional as F

N_BEADS, HIDDEN, LAYERS, HEADS, DIM_HEAD = 10, 64, 3, 8, 64
INNER = HEADS * DIM_HEAD
PARALLEL_SIM = 100
WARMUP, TIMED = 3, 15


class Attention(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.to_q = torch.nn.Linear(HIDDEN, INNER)
        self.to_kv = torch.nn.Linear(HIDDEN, 2 * INNER)
        self.edges_to_kv = torch.nn.Linear(HIDDEN, INNER)
        self.to_out = torch.nn.Linear(INNER, HIDDEN)

    def forward(self, nodes, edges):
        b, n, _ = nodes.shape
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
        out = out.reshape(b, HEADS, n, DIM_HEAD).movedim(1, 2).reshape(b, n, INNER)
        return self.to_out(out)


class Block(torch.nn.Module):
    def __init__(self):
        super().__init__()
        self.norm1 = torch.nn.LayerNorm(HIDDEN)
        self.attn = Attention()
        self.gate1 = torch.nn.Linear(3 * HIDDEN, 1, bias=False)
        self.norm2 = torch.nn.LayerNorm(HIDDEN)
        self.ff = torch.nn.Sequential(
            torch.nn.Linear(HIDDEN, 4 * HIDDEN), torch.nn.GELU(),
            torch.nn.Linear(4 * HIDDEN, HIDDEN),
        )
        self.gate2 = torch.nn.Linear(3 * HIDDEN, 1, bias=False)

    def forward(self, nodes, edges):
        a = self.attn(self.norm1(nodes), edges)
        g = torch.sigmoid(self.gate1(torch.cat((a, nodes, a - nodes), -1)))
        nodes = a * g + nodes * (1 - g)
        f = self.ff(self.norm2(nodes))
        g = torch.sigmoid(self.gate2(torch.cat((f, nodes, f - nodes), -1)))
        return f * g + nodes * (1 - g)


class ScoreNet(torch.nn.Module):
    """Chignolin shipped config: intrinsic coords, conservative energies."""

    def __init__(self):
        super().__init__()
        self.node_embedding = torch.nn.Linear(N_BEADS + 1, HIDDEN)
        self.edge_embedding = torch.nn.Linear(3, HIDDEN)
        self.blocks = torch.nn.ModuleList([Block() for _ in range(LAYERS)])
        self.node_decoder = torch.nn.Linear(HIDDEN, 1)

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


def main():
    torch.manual_seed(0)
    net = ScoreNet().eval()
    x = torch.randn(PARALLEL_SIM, N_BEADS, 3)
    v = torch.zeros_like(x)
    dt, friction, mass, kbt = 2e-3, 1.0, 12.0, 0.1
    vscale = math.exp(-dt * friction)
    noisescale = math.sqrt(1 - vscale * vscale)
    t_norm = torch.full((PARALLEL_SIM,), 0.02)

    def step(x, v):
        x = x - x.mean(dim=1, keepdim=True)
        forces = net(x, t_norm)
        v = v + dt * forces / mass
        x = x + v * dt / 2
        v = v * vscale + noisescale * math.sqrt(kbt / mass) * torch.randn_like(v)
        x = x + v * dt / 2
        return x.detach(), v.detach()

    for _ in range(WARMUP):
        x, v = step(x, v)
    t0 = time.perf_counter()
    for _ in range(TIMED):
        x, v = step(x, v)
    elapsed = time.perf_counter() - t0
    steps_per_sec = TIMED / elapsed

    out = {
        "langevin_steps_per_sec_cpu_torch": steps_per_sec,
        "config": {
            "mol": "chignolin", "parallel_sim": PARALLEL_SIM,
            "hidden_nf": HIDDEN, "n_layers": LAYERS, "conservative": True,
            "device": "cpu", "torch": torch.__version__,
        },
    }
    path = os.path.join(os.path.dirname(os.path.dirname(os.path.abspath(__file__))),
                        "BASELINE_MEASURED.json")
    with open(path, "w") as f:
        json.dump(out, f, indent=2)
    print(json.dumps(out))


if __name__ == "__main__":
    main()
