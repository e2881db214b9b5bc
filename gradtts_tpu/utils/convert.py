"""Convert reference PyTorch checkpoints (state_dicts) to flax param trees.

Handles the GradTTS acoustic model (/root/reference/model/tts.py state_dict
layout: ``encoder.*`` + ``decoder.estimator.*`` (+ ``spk_emb.*``)) and, in
gradtts_tpu/models/hifigan.py, the HiFi-GAN generator (with weight-norm
folding).

Transforms per parameter kind:
  torch Conv1d  (O, I, K)     -> flax Conv kernel (K, I, O)
  torch Conv1d k=1 -> Dense   -> (I, O)           (attention q/k/v/o)
  torch Linear  (O, I)        -> Dense kernel (I, O)
  torch Conv2d  (O, I, Kh, Kw)-> (Kh, Kw, I, O)
  torch ConvTranspose2d (I, O, Kh, Kw) -> spatially flipped (Kh, Kw, I, O)
      (our Upsample runs it as a direct conv with lhs dilation)
  Embedding / LayerNorm gamma,beta / GroupNorm / Rezero g / rel-pos tables
      -> copied directly
"""

import re

import numpy as np


def _t(x):
    return np.asarray(x, dtype=np.float32)


def conv1d_w(w):
    return _t(w).transpose(2, 1, 0)


def dense_w(w):
    return _t(w).T


def dense_from_conv1_w(w):
    return _t(w)[:, :, 0].T


def conv2d_w(w):
    return _t(w).transpose(2, 3, 1, 0)


def convtranspose2d_w(w):
    return _t(w).transpose(2, 3, 0, 1)[::-1, ::-1].copy()


def _flatten(tree, prefix=()):
    out = {}
    for k, v in tree.items():
        if isinstance(v, dict):
            out.update(_flatten(v, prefix + (k,)))
        else:
            out[prefix + (k,)] = v
    return out


def _unflatten(flat):
    tree = {}
    for path, v in flat.items():
        node = tree
        for k in path[:-1]:
            node = node.setdefault(k, {})
        node[path[-1]] = v
    return tree


_IDX = re.compile(r'^(.*)_(\d+)$')


def _encoder_torch_key(path):
    """('prenet','conv_layers_0','kernel') -> ('encoder.prenet.conv_layers.0.weight', kind)."""
    parts = list(path)
    leaf = parts[-1]
    mods = parts[:-1]

    def split_idx(name):
        m = _IDX.match(name)
        return (m.group(1), m.group(2)) if m else (name, None)

    torch_parts = []
    for m in mods:
        base, idx = split_idx(m)
        if base in ('conv_layers', 'norm_layers', 'attn_layers', 'ffn_layers',
                    'norm_layers_1', 'norm_layers_2'):
            torch_parts += [base, idx]
        else:
            torch_parts.append(m)
    # LayerNorm params keep their torch names gamma/beta; conv/dense map
    kind = None
    if leaf == 'kernel':
        torch_leaf = 'weight'
        last = mods[-1]
        if last in ('conv_q', 'conv_k', 'conv_v', 'conv_o'):
            kind = 'dense_from_conv1'
        else:
            kind = 'conv1d'
    elif leaf == 'bias':
        torch_leaf = 'bias'
    elif leaf in ('gamma', 'beta'):
        torch_leaf = leaf
    elif leaf == 'embedding':
        torch_leaf = 'weight'
    elif leaf in ('emb_rel_k', 'emb_rel_v'):
        return '.'.join(['encoder'] + torch_parts + [leaf]), None
    else:
        raise KeyError(f'unhandled encoder leaf {path}')
    return '.'.join(['encoder'] + torch_parts + [torch_leaf]), kind


def _estimator_torch_key(path):
    """flax estimator path -> (torch key under decoder.estimator, kind)."""
    parts = list(path)
    leaf = parts[-1]
    name = parts[0]

    def resblock(sub, tprefix):
        # sub like ['block1','conv','kernel'] / ['mlp_dense','kernel'] / ['res_conv','kernel']
        if sub[0] in ('block1', 'block2'):
            which = {'conv': '0', 'norm': '1'}[sub[1]]
            tleaf = {'kernel': 'weight', 'bias': 'bias',
                     'scale': 'weight'}[sub[2]]
            kind = 'conv2d' if sub[2] == 'kernel' else None
            return f'{tprefix}.{sub[0]}.block.{which}.{tleaf}', kind
        if sub[0] == 'mlp_dense':
            tleaf = {'kernel': 'weight', 'bias': 'bias'}[sub[1]]
            return f'{tprefix}.mlp.1.{tleaf}', 'dense' if sub[1] == 'kernel' else None
        if sub[0] == 'res_conv':
            tleaf = {'kernel': 'weight', 'bias': 'bias'}[sub[1]]
            return f'{tprefix}.res_conv.{tleaf}', 'conv2d' if sub[1] == 'kernel' else None
        raise KeyError(sub)

    def attnblock(sub, tprefix):
        # Residual(Rezero(LinearAttention)) => torch .fn.g / .fn.fn.to_*
        if sub[0] == 'g':
            return f'{tprefix}.fn.g', None
        conv = sub[1]  # to_qkv / to_out
        tleaf = {'kernel': 'weight', 'bias': 'bias'}[sub[2]]
        kind = 'conv2d' if sub[2] == 'kernel' else None
        return f'{tprefix}.fn.fn.{conv}.{tleaf}', kind

    m = re.match(r'^(downs|ups)_(\d+)_(res1|res2|attn|down|up)$', name)
    if m:
        grp, i, role = m.group(1), m.group(2), m.group(3)
        slot = {'res1': '0', 'res2': '1', 'attn': '2',
                'down': '3', 'up': '3'}[role]
        tprefix = f'{grp}.{i}.{slot}'
        if role in ('res1', 'res2'):
            return resblock(parts[1:], tprefix)
        if role == 'attn':
            return attnblock(parts[1:], tprefix)
        if role == 'down':
            tleaf = {'kernel': 'weight', 'bias': 'bias'}[parts[-1]]
            return f'{tprefix}.conv.{tleaf}', 'conv2d' if parts[-1] == 'kernel' else None
        if role == 'up':
            tleaf = {'kernel': 'weight', 'bias': 'bias'}[parts[-1]]
            return f'{tprefix}.conv.{tleaf}', 'convT2d' if parts[-1] == 'kernel' else None
    if name in ('mid_block1', 'mid_block2'):
        return resblock(parts[1:], name)
    if name == 'mid_attn':
        return attnblock(parts[1:], name)
    if name == 'final_block':
        which = {'conv': '0', 'norm': '1'}[parts[1]]
        tleaf = {'kernel': 'weight', 'bias': 'bias', 'scale': 'weight'}[parts[2]]
        return f'final_block.block.{which}.{tleaf}', 'conv2d' if parts[2] == 'kernel' else None
    if name == 'final_conv':
        tleaf = {'kernel': 'weight', 'bias': 'bias'}[parts[1]]
        return f'final_conv.{tleaf}', 'conv2d' if parts[1] == 'kernel' else None
    m = re.match(r'^(spk_mlp|mlp)_(\d)$', name)
    if m:
        tleaf = {'kernel': 'weight', 'bias': 'bias'}[parts[1]]
        return f'{m.group(1)}.{m.group(2)}.{tleaf}', 'dense' if parts[1] == 'kernel' else None
    raise KeyError(f'unhandled estimator path {path}')


_KIND_FN = {
    None: _t,
    'conv1d': conv1d_w,
    'dense': dense_w,
    'dense_from_conv1': dense_from_conv1_w,
    'conv2d': conv2d_w,
    'convT2d': convtranspose2d_w,
}


def detect_encoder_speaker(state_dict, n_enc_channels: int) -> bool:
    """True if a reference ``state_dict`` uses the UPSTREAM encoder-side
    speaker wiring (speaker embedding concatenated after the prenet, so
    encoder.proj_m consumes n_enc_channels + spk_emb_dim inputs); False for
    the fork wiring (decoder-only conditioning). Lets checkpoint loaders
    instantiate the right GradTTS variant automatically (SURVEY.md §3)."""
    w = state_dict.get('encoder.proj_m.weight')
    if w is None:
        return False
    in_ch = np.asarray(getattr(w, 'shape', np.shape(w)))[1]
    return int(in_ch) > n_enc_channels


def gradtts_torch_to_flax(state_dict, flax_params):
    """Map a reference GradTTS ``state_dict`` (tensors or ndarrays) onto the
    structure of ``flax_params`` (as produced by ``GradTTS.init``).

    Returns a new params tree; raises if any flax leaf has no torch source
    or shapes mismatch.
    """
    sd = {k: np.asarray(getattr(v, 'detach', lambda: v)().cpu().numpy()
                        if hasattr(v, 'detach') else v)
          for k, v in state_dict.items()}
    flat = _flatten(flax_params['params'])
    out = {}
    for path, leaf in flat.items():
        if path[0] == 'encoder':
            tkey, kind = _encoder_torch_key(path[1:])
        elif path[0] == 'estimator':
            tkey, kind = _estimator_torch_key(path[1:])
            tkey = 'decoder.estimator.' + tkey
        elif path[0] == 'spk_emb':
            tkey, kind = 'spk_emb.weight', None
        else:
            raise KeyError(f'unhandled top-level module {path[0]}')
        if tkey not in sd:
            raise KeyError(f'missing torch key {tkey} for flax path {path}')
        val = _KIND_FN[kind](sd[tkey])
        if val.shape != leaf.shape:
            raise ValueError(
                f'shape mismatch at {path} <- {tkey}: {val.shape} vs {leaf.shape}')
        out[path] = val.astype(np.asarray(leaf).dtype)
    return {'params': _unflatten(out)}
