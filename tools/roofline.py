"""Whole-program MFU / HBM-roofline accounting on the real chip.

For each production phase — (a) the folded U-Net estimator forward,
(b) the full 10-step Euler synthesis program, (c) the full training step,
(d) the 10-step likelihood-scoring step — this tool reports:

  - FLOPs and HBM bytes from XLA's own optimized-HLO cost analysis
    (``compiled.cost_analysis()``: per-fusion operand/output bytes, so a
    good proxy for actual HBM traffic after fusion),
  - measured wall time per call (bench.py chained-fetch protocol — the
    tunneled backend's block_until_ready returns early),
  - MFU  = flops / time / peak_flops      (v5e bf16 peak: 197 TFLOP/s)
  - BW%% = bytes / time / peak_bandwidth  (v5e HBM: ~819 GB/s)

A program is at the chip's speed of light when max(MFU, BW%) approaches
1; whichever is higher names the binding roofline. Run from /root/repo:

  python tools/roofline.py [estimator synthesis train likelihood]

Writes one JSON line per phase; PERFORMANCE.md's roofline table is
produced from this output.
"""

import argparse
import json
import time

import numpy as np

import jax
import jax.numpy as jnp

PEAK_FLOPS = 197e12   # v5e bf16 peak (MXU)
PEAK_BW = 819e9       # v5e HBM bandwidth
HOP, SR = 256, 22050


def timed_per_call(jfn, args_for, k=8):
    """bench.py protocol: chained calls ending in one scalar fetch."""
    def run(kk, seed0):
        t0 = time.perf_counter()
        v = 0.0
        for i in range(kk):
            v = jfn(*args_for(seed0 + i))
        float(v)
        return time.perf_counter() - t0

    float(jfn(*args_for(0)))
    float(jfn(*args_for(1)))
    t1 = min(run(1, 100), run(1, 200))
    tk = min(run(k, 300), run(k, 400))
    return max((tk - t1) / (k - 1), 1e-9)


def cost_of(lowered_compiled):
    ca = lowered_compiled.cost_analysis()
    d = ca[0] if isinstance(ca, (list, tuple)) else ca
    flops = float(d.get('flops', 0.0))
    try:
        bytes_ = hlo_bytes(lowered_compiled)
    except Exception:
        bytes_ = float(d.get('bytes accessed', 0.0))
    return flops, bytes_


# --- HBM bytes from the optimized HLO text (round 5) -----------------------
#
# ``cost_analysis()['bytes accessed']`` overcounts: broadcast operands are
# billed at their POST-broadcast size and an operand used twice inside one
# fusion is billed twice — four PERFORMANCE.md roofline rows exceeded 100%
# of physical bandwidth, which is impossible. This estimator walks the
# optimized HLO entry computation instead and bills, per top-level
# instruction: its result buffer (one HBM write) plus each UNIQUE operand
# at the size of the buffer the PRODUCING instruction materializes (a
# broadcast fused into a consumer reads the small pre-broadcast buffer).
# Reads of one buffer by K different fusions count K times — that is real
# traffic. Known undercounts (shared with cost_analysis, handled by the
# compose method): while/scan bodies are billed once, not per trip.

import re

_DTYPE_BYTES = {'f64': 8, 'f32': 4, 'f16': 2, 'bf16': 2, 's64': 8,
                'u64': 8, 's32': 4, 'u32': 4, 's16': 2, 'u16': 2,
                's8': 1, 'u8': 1, 'pred': 1, 'c64': 8, 'c128': 16,
                'f8e4m3fn': 1, 'f8e5m2': 1, 's4': 1, 'u4': 1}

_SHAPE_RE = re.compile(r'([a-z0-9]+)\[([0-9,]*)\]')
_INST_RE = re.compile(r'(?:ROOT\s+)?%?([\w\.\-]+)\s+=\s+(.*)$')
_TYPE_OP_RE = re.compile(
    r'((?:\([^)]*\))|(?:[a-z0-9]+\[[0-9,]*\](?:\{[^}]*\})?))\s+'
    r'([\w\-]+)\(')

# instructions that move no HBM bytes themselves (aliases / metadata)
_FREE_OPS = {'parameter', 'constant', 'tuple', 'get-tuple-element',
             'bitcast', 'after-all', 'opt-barrier'}


def _shape_bytes(text: str) -> int:
    total = 0
    for dt, dims in _SHAPE_RE.findall(text):
        size = _DTYPE_BYTES.get(dt)
        if size is None:
            continue
        n = 1
        for d in dims.split(','):
            if d:
                n *= int(d)
        total += n * size
    return total


def hlo_bytes(lowered_compiled) -> float:
    txt = lowered_compiled.as_text()
    sizes = {}
    insts = []
    in_entry = False
    for line in txt.splitlines():
        s = line.strip()
        if s.startswith('ENTRY '):
            in_entry = True
            continue
        if not in_entry:
            continue
        if s == '}':
            break
        m = _INST_RE.match(s)
        if not m:
            continue
        name, rest = m.groups()
        mo = _TYPE_OP_RE.match(rest)
        if not mo:
            continue
        typ, opcode = mo.groups()
        rbytes = _shape_bytes(typ)
        # operand list = inside the call's first paren group; attributes
        # (calls=, body=, ...) follow the closing paren
        oseg = rest[mo.end():].split(')')[0]
        ops = re.findall(r'%([\w\.\-]+)', oseg)
        sizes[name] = rbytes
        insts.append((name, opcode, rbytes, ops))
    if not insts:
        raise ValueError('no ENTRY computation parsed from HLO text')
    total = 0
    for _name, opcode, rbytes, ops in insts:
        if opcode in _FREE_OPS:
            continue
        total += rbytes
        for o in set(ops):
            total += sizes.get(o, 0)
    return float(total)


def report(phase, flops, bytes_, seconds, note=''):
    mfu = flops / seconds / PEAK_FLOPS
    bw = bytes_ / seconds / PEAK_BW
    print(json.dumps({
        'phase': phase,
        'time_ms': round(seconds * 1e3, 3),
        'gflops': round(flops / 1e9, 2),
        'hbm_gb': round(bytes_ / 1e9, 3),
        'mfu': round(mfu, 4),
        'hbm_roofline_frac': round(bw, 4),
        'bound': 'hbm' if bw > mfu else 'mxu',
        'note': note,
    }), flush=True)


def _tts(preset='ljspeech', B=8, TX=128):
    from gradtts_tpu import get_config
    from gradtts_tpu.models import GradTTS
    cfg = get_config(preset)
    model = GradTTS.from_config(cfg, dtype=jnp.bfloat16)
    rng = np.random.default_rng(0)
    x = jnp.asarray(rng.integers(1, cfg.n_vocab, size=(B, TX)), jnp.int32)
    x_lengths = jnp.full((B,), TX, jnp.int32)
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), x, x_lengths,
        jnp.zeros((B, 8, cfg.data.n_feats)), jnp.full((B,), 8, jnp.int32),
        None)
    return cfg, model, params, x, x_lengths


def phase_estimator(B=8, T=768, fused=None, tag=''):
    from gradtts_tpu.models import GradTTS
    cfg, model, params, _x, _xl = _tts()
    if fused is None:
        from gradtts_tpu.ops.pallas.linear_attention import _on_tpu
        fused = _on_tpu()
    rng = np.random.default_rng(1)
    xt = jnp.asarray(rng.standard_normal((B, T, cfg.data.n_feats)),
                     jnp.float32)
    mu = jnp.asarray(rng.standard_normal((B, T, cfg.data.n_feats)),
                     jnp.float32)
    mask = jnp.ones((B, T), jnp.float32)

    def fn(params, xt, mask, mu, t):
        return model.apply(params, xt, mask, mu, t, None,
                           spk_is_embedded=True, fused_attention=fused,
                           method=GradTTS.estimate).sum()

    jfn = jax.jit(fn)
    t0 = jnp.full((B,), 0.5, jnp.float32)
    flops, bytes_ = cost_of(jfn.lower(params, xt, mask, mu, t0).compile())
    sec = timed_per_call(
        jfn, lambda s: (params, xt, mask, mu,
                        jnp.full((B,), 0.3 + 1e-4 * s, jnp.float32)))
    report(f'estimator_fwd_B8_T768_bf16{tag}', flops, bytes_, sec,
           f'folded U-Net score estimator, one forward, fused={fused}')
    return flops, bytes_, sec


def phase_encoder(B=8, TX=128, Y=768):
    """The pre-sampler part of synthesize: encoder + durations + mu_y."""
    from gradtts_tpu.models.tts import GradTTS
    from gradtts_tpu.ops.seq import sequence_mask, generate_path
    cfg, model, params, x, x_lengths = _tts(B=B, TX=TX)

    def fn(params, x, x_lengths):
        mu_x, logw, x_mask, _ = model.apply(params, x, x_lengths,
                                            method=GradTTS.encode)
        w = jnp.exp(logw[..., 0]) * x_mask[..., 0]
        w_ceil = jnp.ceil(w)
        y_lengths = jnp.minimum(jnp.maximum(jnp.sum(w_ceil, axis=1), 1.0),
                                Y).astype(jnp.int32)
        y_mask = sequence_mask(y_lengths, Y)[..., None].astype(mu_x.dtype)
        attn_mask = x_mask[:, :, None, 0] * y_mask[:, None, :, 0]
        attn = generate_path(w_ceil, attn_mask)
        mu_y = jnp.einsum('bxy,bxf->byf', attn, mu_x)
        return mu_y.sum()

    jfn = jax.jit(fn)
    flops, bytes_ = cost_of(jfn.lower(params, x, x_lengths).compile())
    sec = timed_per_call(jfn, lambda s: (params, x, x_lengths))
    report('encoder_prep_B8_TX128', flops, bytes_, sec,
           'text encoder + durations + prior expansion (once per synth)')
    return flops, bytes_, sec


def phase_drift_eval(B=8, TX=128, TY=512):
    """One Hutchinson drift+divergence evaluation (the likelihood scan
    body): jvp through the estimator — measured scan-free so trip-count
    composition is exact."""
    from gradtts_tpu.likelihood.ode import _drift_and_div
    from gradtts_tpu.likelihood.sde import SpeechSDE
    from gradtts_tpu.models import get_score_fn
    cfg, model, params, x, x_lengths = _tts(B=B, TX=TX)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, TY, cfg.data.n_feats)),
                    jnp.float32)
    y_lengths = jnp.full((B,), TY, jnp.int32)

    def fn(params, y, eps, t):
        score_fn, mu_y, _s, y_mask = get_score_fn(
            model, params, x, x_lengths, y, y_lengths, None)
        sde = SpeechSDE(beta_min=model.beta_min, beta_max=model.beta_max,
                        N=int(model.pe_scale), mu=mu_y, mask=y_mask)
        f = _drift_and_div(sde, score_fn)
        d, div = f(y, t, eps)
        return d.sum() + div.sum()

    # NOTE: this includes encoder+MAS prep; subtract nothing — we report
    # it as prep+1 eval and compose: total = prep + n*eval, where eval =
    # (this) - prep is impractical to isolate exactly; instead we lower a
    # second program with TWO evals and difference them.
    def fn2(params, y, eps, t):
        score_fn, mu_y, _s, y_mask = get_score_fn(
            model, params, x, x_lengths, y, y_lengths, None)
        sde = SpeechSDE(beta_min=model.beta_min, beta_max=model.beta_max,
                        N=int(model.pe_scale), mu=mu_y, mask=y_mask)
        f = _drift_and_div(sde, score_fn)
        d1, v1 = f(y, t, eps)
        d2, v2 = f(y + 1e-3 * d1, t + 0.01, eps)
        return d2.sum() + v1.sum() + v2.sum()

    eps = jnp.asarray(rng.standard_normal(y.shape), jnp.float32)
    t = jnp.full((B,), 0.5, jnp.float32)
    f1, b1 = cost_of(jax.jit(fn).lower(params, y, eps, t).compile())
    f2, b2 = cost_of(jax.jit(fn2).lower(params, y, eps, t).compile())
    sec1 = timed_per_call(
        jax.jit(fn), lambda s: (params, y, eps,
                                jnp.full((B,), 0.3 + 1e-4 * s,
                                         jnp.float32)))
    sec2 = timed_per_call(
        jax.jit(fn2), lambda s: (params, y, eps,
                                 jnp.full((B,), 0.3 + 1e-4 * s,
                                          jnp.float32)))
    # differencing two tunnel-jittery measurements can go non-positive;
    # fall back to the FLOP-ratio split of the 2-eval time in that case
    d_sec = sec2 - sec1
    if d_sec <= 0.1 * sec1:
        d_sec = sec2 * (f2 - f1) / max(f2, 1.0)
    report('hutchinson_drift_eval_B8_T512', f2 - f1, b2 - b1, d_sec,
           'one jvp drift+div eval (difference of 2-eval and 1-eval '
           'programs); prep (encoder+MAS) measured as the 1-eval program '
           'minus this')
    return (f1, b1, sec1), (f2 - f1, b2 - b1, d_sec)


def phase_synthesis(B=8, TX=128, Y=768, n_steps=10):
    from gradtts_tpu.models import synthesize
    cfg, model, params, x, x_lengths = _tts(B=B, TX=TX)

    def fn(params, x, x_lengths, key):
        res = synthesize(model, params, x, x_lengths, n_timesteps=n_steps,
                         y_max_length=Y, key=key)
        return res.decoder_outputs.sum()

    jfn = jax.jit(fn)
    key = jax.random.PRNGKey(1)
    flops, bytes_ = cost_of(jfn.lower(params, x, x_lengths, key).compile())
    sec = timed_per_call(
        jfn, lambda s: (params, x, x_lengths, jax.random.PRNGKey(s)))
    audio_s = B * Y * HOP / SR
    report('synthesis_10step_B8_T768', flops, bytes_, sec,
           f'{audio_s / sec:.1f} audio-s/s; encoder + {n_steps} estimator '
           'calls in one program')


def phase_train(B=16):
    from gradtts_tpu import get_config
    from gradtts_tpu.models import GradTTS
    from gradtts_tpu.train.state import (
        init_state, make_optimizer, make_train_step)
    cfg = get_config('tedlium-spk')
    model = GradTTS.from_config(cfg, dtype=jnp.bfloat16)
    TX, TY = 192, 344
    rng = np.random.default_rng(0)
    batch = {
        'x': jnp.asarray(rng.integers(1, cfg.n_vocab, (B, TX)), jnp.int32),
        'x_lengths': jnp.full((B,), TX, jnp.int32),
        'y': jnp.asarray(rng.standard_normal((B, TY, cfg.data.n_feats)),
                         jnp.float32),
        'y_lengths': jnp.full((B,), TY, jnp.int32),
        'spk': jnp.asarray(rng.integers(0, cfg.n_spks, (B,)), jnp.int32),
    }
    params = jax.jit(model.init)(
        jax.random.PRNGKey(0), batch['x'], batch['x_lengths'],
        batch['y'][:, :8], jnp.full((B,), 8, jnp.int32), batch['spk'])
    optimizer = make_optimizer(cfg.train.learning_rate)
    state = init_state(params, optimizer)
    step = make_train_step(model, optimizer, out_size=cfg.out_size)

    def fn(state, batch, key):
        state, metrics = step(state, batch, key)
        return state, metrics['loss/total']

    jfn = jax.jit(fn, donate_argnums=(0,))
    flops, bytes_ = cost_of(
        jfn.lower(state, batch, jax.random.PRNGKey(0)).compile())

    # donation-aware timing (bench_suite.bench_train_step protocol)
    def run(kk, seed0):
        nonlocal state
        t0 = time.perf_counter()
        v = 0.0
        for i in range(kk):
            state, v = jfn(state, batch, jax.random.PRNGKey(seed0 + i))
        float(v)
        return time.perf_counter() - t0

    state, v = jfn(state, batch, jax.random.PRNGKey(0))
    float(v)
    t1 = min(run(1, 100), run(1, 200))
    tk = min(run(8, 300), run(8, 400))
    sec = max((tk - t1) / 7, 1e-9)
    report('train_step_B16_crop128', flops, bytes_, sec,
           f'{B / sec:.0f} utt/s; 3 losses + MAS + clip + adam fwd+bwd')


def phase_likelihood(B=8, TX=128, TY=512, n_euler=10):
    from gradtts_tpu.nbest.scoring import score_batch
    cfg, model, params, x, x_lengths = _tts(B=B, TX=TX)
    rng = np.random.default_rng(0)
    y = jnp.asarray(rng.standard_normal((B, TY, cfg.data.n_feats)),
                    jnp.float32)
    y_lengths = jnp.full((B,), TY, jnp.int32)

    def fn(params, key, x, x_lengths, y, y_lengths):
        return score_batch(model, params, key, x, x_lengths, y, y_lengths,
                           n_euler=n_euler).score.sum()

    jfn = jax.jit(fn)
    key = jax.random.PRNGKey(1)
    flops, bytes_ = cost_of(
        jfn.lower(params, key, x, x_lengths, y, y_lengths).compile())
    sec = timed_per_call(
        jfn, lambda s: (params, jax.random.PRNGKey(s), x, x_lengths,
                        y, y_lengths))
    report('likelihood_10step_B8_T512', flops, bytes_, sec,
           f'{B / sec:.1f} hyp/s; encoder + MAS + Hutchinson-jvp Euler')


def phase_compose():
    """Corrected whole-program accounting: XLA's cost analysis counts a
    lax.scan body ONCE (verified: the 10-step synthesis program reports
    fewer flops than one estimator forward), so scan-heavy programs are
    composed from scan-free parts: synthesis = encoder + 10 x estimator;
    likelihood = prep + 10 x drift_eval."""
    ef, eb, es = phase_estimator()
    cf, cb, cs = phase_encoder()
    (pf, pb, ps), (df, db_, ds) = phase_drift_eval()

    # synthesis: 10 sampler steps (estimator + elementwise update ~ 3
    # tensor passes, bytes only) + prep
    step_extra_bytes = 3 * 8 * 768 * 80 * 4
    syn_f = cf + 10 * ef
    syn_b = cb + 10 * (eb + step_extra_bytes)
    report('synthesis_10step_composed', syn_f, syn_b, cs + 10 * es,
           'encoder + 10x(estimator + euler update); time = sum of parts '
           '(compare to measured whole-program synthesis phase)')

    # likelihood: prep (= 1-eval program minus one eval) + 10 evals
    lik_f = (pf - df) + 10 * df
    lik_b = (pb - db_) + 10 * db_
    report('likelihood_10step_composed', lik_f, lik_b,
           max(ps - ds, 0.0) + 10 * ds,
           'encoder/MAS prep + 10x hutchinson jvp eval')


def phase_mel_frontend(B=8, Y=768):
    """The on-chip mel front end (DataLoader(device_mel=True) compute
    path): batched framing + rfft-as-matmul + mel matmul + log. The
    round-4 verdict asked for its roofline row so the 'Pallas candidate'
    note in data/mel.py can be closed or acted on by measurement."""
    from gradtts_tpu.data.mel import mel_from_padded
    hop, n_fft = 256, 1024
    S = (Y - 1) * hop + n_fft
    rng = np.random.default_rng(0)
    audio = jnp.asarray(rng.standard_normal((B, S)) * 0.1, jnp.float32)

    def fn(audio):
        return mel_from_padded(audio).sum()

    jfn = jax.jit(fn)
    flops, bytes_ = cost_of(jfn.lower(audio).compile())
    sec = timed_per_call(jfn, lambda s: (audio + 1e-6 * s,))
    report('mel_frontend_B8_768f', flops, bytes_, sec,
           f'{B * Y * HOP / SR / sec:.0f} audio-s/s; batched STFT + '
           'slaney mel + log, one jitted program')
    return flops, bytes_, sec


PHASES = {
    'estimator': phase_estimator,
    'synthesis': phase_synthesis,
    'train': phase_train,
    'likelihood': phase_likelihood,
    'encoder': phase_encoder,
    'drift': phase_drift_eval,
    'mel': phase_mel_frontend,
    'compose': phase_compose,
}


if __name__ == '__main__':
    ap = argparse.ArgumentParser()
    ap.add_argument('phases', nargs='*', default=list(PHASES))
    args = ap.parse_args()
    for name in (args.phases or list(PHASES)):
        PHASES[name]()
