"""Whisper ASR, TPU-native (flax).

The reference transcribes separated estimates with faster-whisper
(separation/look2hear/metrics/asr.py:3-12) and records the transcript per
eval segment (metrics/wrapper.py:113). This is that model natively:

* :func:`log_mel` — Whisper's log-mel frontend (16 kHz, 400-pt periodic
  Hann, hop 160, slaney-scale/slaney-norm mel filterbank, dynamic-range
  clamp at max−8 dB, (x+4)/4 scaling), replica-tested against
  transformers' WhisperFeatureExtractor;
* :class:`Whisper` — the encoder-decoder transformer (conv×2 + sinusoidal
  positions encoder, learned-position causal decoder with cross-attention,
  tied output embedding), pre-LN, exact-GELU;
* :func:`greedy_decode` — single-dispatch greedy decoding: per-layer
  self-attention KV caches in fixed-size buffers driven by one
  ``lax.while_loop`` (no per-token host round-trips through the TPU
  tunnel);
* :func:`convert_whisper` / :func:`load_whisper` — imports both HF
  (``model.encoder...`` state dicts + config.json) and OpenAI
  (``dims``/``model_state_dict``) checkpoint formats;
* :class:`ByteBpeDecoder` — GPT-2 byte-level detokenizer (vocab.json),
  decode-only (ASR never needs the merge table);
* :func:`make_whisper_transcriber` — the tracker ``extra_text`` contract
  ``fn(audio, sample_rate) -> str`` (same role as sidecars.make_whisper_asr,
  without the CTranslate2 dependency).

Forward parity is tested against a torch WhisperForConditionalGeneration
in tests/test_whisper.py (random tiny config; the released weight files are
external downloads here, like the reference's).
"""

from __future__ import annotations

import json
from dataclasses import dataclass
from functools import lru_cache, partial
from pathlib import Path

import flax.linen as nn
import jax
import jax.numpy as jnp
import numpy as np

from ..ops.stft import hann_window, stft

SAMPLE_RATE = 16000
N_FFT = 400
HOP = 160
CHUNK_SAMPLES = 30 * SAMPLE_RATE  # one 30 s decoding window


# ---------------------------------------------------------------------------
# Log-mel frontend (openai/whisper audio.py semantics == HF feature extractor)
# ---------------------------------------------------------------------------

def _hz_to_mel_slaney(f):
    f = np.asarray(f, np.float64)
    mel = 3.0 * f / 200.0
    log_region = f >= 1000.0
    mel = np.where(
        log_region,
        15.0 + np.log(np.maximum(f, 1e-12) / 1000.0) * (27.0 / np.log(6.4)),
        mel,
    )
    return mel


def _mel_to_hz_slaney(m):
    m = np.asarray(m, np.float64)
    f = 200.0 * m / 3.0
    log_region = m >= 15.0
    f = np.where(log_region, 1000.0 * np.exp(np.log(6.4) / 27.0 * (m - 15.0)), f)
    return f


@lru_cache(maxsize=4)
def mel_filters(n_mels: int, n_fft: int = N_FFT,
                sample_rate: int = SAMPLE_RATE,
                fmax: float | None = None) -> np.ndarray:
    """(n_fft//2+1, n_mels) slaney-scale, slaney-normalized triangle bank —
    the exact filterbank Whisper ships (librosa.filters.mel defaults)."""
    fmax = sample_rate / 2 if fmax is None else fmax
    fft_freqs = np.linspace(0, sample_rate / 2, n_fft // 2 + 1)
    mel_pts = np.linspace(
        _hz_to_mel_slaney(0.0), _hz_to_mel_slaney(fmax), n_mels + 2
    )
    hz_pts = _mel_to_hz_slaney(mel_pts)
    fdiff = np.diff(hz_pts)
    ramps = hz_pts[None, :] - fft_freqs[:, None]  # (F, n_mels+2)
    lower = -ramps[:, :-2] / fdiff[None, :-1]
    upper = ramps[:, 2:] / fdiff[None, 1:]
    weights = np.maximum(0.0, np.minimum(lower, upper))
    enorm = 2.0 / (hz_pts[2:] - hz_pts[:-2])
    return (weights * enorm[None, :]).astype(np.float32)


def log_mel(wav: jax.Array, n_mels: int = 80) -> jax.Array:
    """(T,) or (B, T) 16 kHz waveform → (B, n_mels, frames) log-mel features.

    Matches WhisperFeatureExtractor exactly: torch.stft(center=True,
    reflect), drop the last frame, |·|², mel project, log10 clamped at
    1e-10, dynamic-range floor at per-example max − 8, then (x+4)/4.
    The caller pads/trims to 30 s windows (3000 frames) first.
    """
    wav = jnp.atleast_2d(jnp.asarray(wav, jnp.float32))
    spec = stft(wav, N_FFT, HOP, hann_window(N_FFT))  # (B, F, frames)
    mag2 = (spec.real ** 2 + spec.imag ** 2)[..., :-1]
    mel = jnp.einsum(
        "fm,bft->bmt", jnp.asarray(mel_filters(n_mels)), mag2
    )
    log_spec = jnp.log10(jnp.maximum(mel, 1e-10))
    floor = jnp.max(log_spec, axis=(1, 2), keepdims=True) - 8.0
    return (jnp.maximum(log_spec, floor) + 4.0) / 4.0


def pad_or_trim(wav: np.ndarray, length: int = CHUNK_SAMPLES) -> np.ndarray:
    wav = np.asarray(wav, np.float32).reshape(-1)
    if len(wav) >= length:
        return wav[:length]
    return np.pad(wav, (0, length - len(wav)))


# ---------------------------------------------------------------------------
# Model
# ---------------------------------------------------------------------------

@dataclass(frozen=True)
class WhisperConfig:
    vocab_size: int
    n_mels: int
    d_model: int
    encoder_layers: int
    decoder_layers: int
    heads: int
    ffn: int
    max_source_positions: int = 1500
    max_target_positions: int = 448


def sinusoids(length: int, channels: int) -> np.ndarray:
    """Whisper's encoder positional table (log-spaced sinusoids)."""
    log_timescale = np.log(10000.0) / (channels // 2 - 1)
    inv = np.exp(-log_timescale * np.arange(channels // 2))
    angles = np.arange(length)[:, None] * inv[None, :]
    return np.concatenate(
        [np.sin(angles), np.cos(angles)], axis=1
    ).astype(np.float32)


class MHA(nn.Module):
    """Whisper attention: q/v/out biased, k unbiased, q pre-scaled."""

    d_model: int
    heads: int

    def setup(self):
        self.q_proj = nn.Dense(self.d_model)
        self.k_proj = nn.Dense(self.d_model, use_bias=False)
        self.v_proj = nn.Dense(self.d_model)
        self.out_proj = nn.Dense(self.d_model)

    def _split(self, x):
        b, t, _ = x.shape
        return x.reshape(b, t, self.heads, self.d_model // self.heads)

    def attend(self, q, k, v, mask=None):
        """(B, Tq, H, Dh) × (B, Tk, H, Dh) → (B, Tq, D); q already scaled."""
        logits = jnp.einsum("bqhd,bkhd->bhqk", q, k)
        if mask is not None:
            logits = jnp.where(mask, logits, jnp.finfo(logits.dtype).min)
        w = jax.nn.softmax(logits.astype(jnp.float32), axis=-1).astype(q.dtype)
        out = jnp.einsum("bhqk,bkhd->bqhd", w, v)
        return self.out_proj(out.reshape(*out.shape[:2], self.d_model))

    def q_scaled(self, x):
        scale = (self.d_model // self.heads) ** -0.5
        return self._split(self.q_proj(x) * scale)

    def kv(self, x):
        return self._split(self.k_proj(x)), self._split(self.v_proj(x))

    def __call__(self, x, kv_source=None, mask=None):
        kv_source = x if kv_source is None else kv_source
        k, v = self.kv(kv_source)
        return self.attend(self.q_scaled(x), k, v, mask)


class WhisperBlock(nn.Module):
    cfg: WhisperConfig
    cross: bool

    def setup(self):
        self.self_attn_layer_norm = nn.LayerNorm(epsilon=1e-5)
        self.self_attn = MHA(self.cfg.d_model, self.cfg.heads)
        if self.cross:
            self.encoder_attn_layer_norm = nn.LayerNorm(epsilon=1e-5)
            self.encoder_attn = MHA(self.cfg.d_model, self.cfg.heads)
        self.final_layer_norm = nn.LayerNorm(epsilon=1e-5)
        self.fc1 = nn.Dense(self.cfg.ffn)
        self.fc2 = nn.Dense(self.cfg.d_model)

    def _mlp(self, x):
        return x + self.fc2(
            jax.nn.gelu(self.fc1(self.final_layer_norm(x)), approximate=False)
        )

    def __call__(self, x, enc=None, self_mask=None):
        x = x + self.self_attn(self.self_attn_layer_norm(x), mask=self_mask)
        if self.cross:
            x = x + self.encoder_attn(
                self.encoder_attn_layer_norm(x), kv_source=enc
            )
        return self._mlp(x)

    def step(self, x, pos, self_kv, cross_kv):
        """One decode position. x (B, 1, D); self_kv = (k, v) fixed-size
        (B, Tmax, H, Dh) buffers; cross_kv = precomputed (k, v) over enc."""
        h = self.self_attn_layer_norm(x)
        k_new, v_new = self.self_attn.kv(h)
        k_buf = jax.lax.dynamic_update_slice(self_kv[0], k_new, (0, pos, 0, 0))
        v_buf = jax.lax.dynamic_update_slice(self_kv[1], v_new, (0, pos, 0, 0))
        valid = (jnp.arange(k_buf.shape[1]) <= pos)[None, None, None, :]
        x = x + self.self_attn.attend(
            self.self_attn.q_scaled(h), k_buf, v_buf, valid
        )
        if self.cross:
            h = self.encoder_attn_layer_norm(x)
            x = x + self.encoder_attn.attend(
                self.encoder_attn.q_scaled(h), cross_kv[0], cross_kv[1]
            )
        return self._mlp(x), (k_buf, v_buf)

    def cross_cache(self, enc):
        return self.encoder_attn.kv(enc) if self.cross else None


class Whisper(nn.Module):
    """HF WhisperForConditionalGeneration graph (tied proj_out)."""

    cfg: WhisperConfig

    def setup(self):
        c = self.cfg
        self.conv1 = nn.Conv(c.d_model, (3,), padding=1)
        self.conv2 = nn.Conv(c.d_model, (3,), strides=(2,), padding=1)
        self.enc_positions = self.param(
            "enc_positions",
            lambda _: jnp.asarray(sinusoids(c.max_source_positions, c.d_model)),
        )
        self.enc_blocks = [
            WhisperBlock(c, cross=False) for _ in range(c.encoder_layers)
        ]
        self.enc_ln = nn.LayerNorm(epsilon=1e-5)

        self.embed_tokens = nn.Embed(c.vocab_size, c.d_model)
        self.dec_positions = self.param(
            "dec_positions",
            nn.initializers.normal(0.02),
            (c.max_target_positions, c.d_model),
        )
        self.dec_blocks = [
            WhisperBlock(c, cross=True) for _ in range(c.decoder_layers)
        ]
        self.dec_ln = nn.LayerNorm(epsilon=1e-5)

    def encode(self, mel: jax.Array) -> jax.Array:
        """(B, n_mels, frames) → (B, frames//2, D)."""
        x = jax.nn.gelu(self.conv1(mel.transpose(0, 2, 1)), approximate=False)
        x = jax.nn.gelu(self.conv2(x), approximate=False)
        x = x + self.enc_positions[None, : x.shape[1]]
        for blk in self.enc_blocks:
            x = blk(x)
        return self.enc_ln(x)

    def decode(self, tokens: jax.Array, enc: jax.Array) -> jax.Array:
        """(B, S) int tokens × encoder output → (B, S, vocab) logits."""
        s = tokens.shape[1]
        x = self.embed_tokens(tokens) + self.dec_positions[None, :s]
        causal = jnp.tril(jnp.ones((s, s), bool))[None, None]
        for blk in self.dec_blocks:
            x = blk(x, enc=enc, self_mask=causal)
        x = self.dec_ln(x)
        return x @ self.embed_tokens.embedding.T

    def __call__(self, mel: jax.Array, tokens: jax.Array) -> jax.Array:
        return self.decode(tokens, self.encode(mel))

    def init_cache(self, enc: jax.Array, max_len: int):
        """Per-layer ((k_self, v_self) zero buffers, (k_cross, v_cross))."""
        c = self.cfg
        b = enc.shape[0]
        zeros = jnp.zeros(
            (b, max_len, c.heads, c.d_model // c.heads), enc.dtype
        )
        self_kv = [(zeros, zeros) for _ in self.dec_blocks]
        cross_kv = [blk.cross_cache(enc) for blk in self.dec_blocks]
        return self_kv, cross_kv

    def decode_step(self, token, pos, self_kv, cross_kv):
        """token (B,) int, pos scalar → ((B, vocab) logits, updated self_kv)."""
        x = (self.embed_tokens(token[:, None])
             + jax.lax.dynamic_slice_in_dim(self.dec_positions, pos, 1)[None])
        new_kv = []
        for blk, skv, ckv in zip(self.dec_blocks, self_kv, cross_kv):
            x, skv = blk.step(x, pos, skv, ckv)
            new_kv.append(skv)
        x = self.dec_ln(x)
        return (x @ self.embed_tokens.embedding.T)[:, 0], new_kv


def greedy_decode(model: Whisper, params, mel: jax.Array,
                  sot: np.ndarray, eot: int, max_len: int | None = None,
                  suppress: np.ndarray | None = None) -> jax.Array:
    """Greedy transcription of one mel batch in a single dispatch.

    Runs the sot prefix and the generated suffix through the same cached
    ``decode_step`` inside ``lax.while_loop`` (forced tokens while
    pos+1 < len(sot)). Returns the (B, max_len) token buffer — positions
    after the first ``eot`` repeat ``eot``.
    """
    cfg = model.cfg
    max_len = max_len or cfg.max_target_positions
    enc = model.apply(params, mel, method=Whisper.encode)
    self_kv, cross_kv = model.apply(
        params, enc, max_len, method=Whisper.init_cache
    )
    b = enc.shape[0]
    tokens = jnp.full((b, max_len), eot, jnp.int32)
    tokens = tokens.at[:, : len(sot)].set(jnp.asarray(sot, jnp.int32)[None])
    sup = None if suppress is None else jnp.asarray(suppress, bool)

    def cond(state):
        tokens, pos, done, _ = state
        return (pos + 1 < max_len) & ~jnp.all(done)

    def body(state):
        tokens, pos, done, self_kv = state
        logits, self_kv = model.apply(
            params, tokens[:, pos], pos, self_kv, cross_kv,
            method=Whisper.decode_step,
        )
        if sup is not None:
            logits = jnp.where(sup[None], jnp.finfo(logits.dtype).min, logits)
        nxt = jnp.argmax(logits, axis=-1).astype(jnp.int32)
        forced = pos + 1 < len(sot)
        nxt = jnp.where(forced, tokens[:, pos + 1], nxt)
        nxt = jnp.where(done & ~forced, eot, nxt)
        tokens = jax.lax.dynamic_update_slice(tokens, nxt[:, None], (0, pos + 1))
        done = done | (~forced & (nxt == eot))
        return tokens, pos + 1, done, self_kv

    tokens, _, _, _ = jax.lax.while_loop(
        cond, body, (tokens, jnp.asarray(0), jnp.zeros((b,), bool), self_kv)
    )
    return tokens


def beam_decode(model: Whisper, params, mel: jax.Array,
                sot: np.ndarray, eot: int, beam: int = 5,
                max_len: int | None = None,
                suppress: np.ndarray | None = None,
                length_penalty: float = 1.0) -> tuple[jax.Array, jax.Array]:
    """Beam-search transcription of ONE mel chunk (HF-semantics).

    Mirrors transformers' vectorized ``_beam_search`` (generation/utils.py,
    the decoder faster-whisper's beam_size=5 default corresponds to,
    reference: separation/look2hear/metrics/asr.py:3-12): 2·beam
    continuations per step, eos/max-length candidates finalized with score
    sum_logprobs / generated_len**length_penalty, running beams continue
    until the early-stop heuristic (best attainable running score can no
    longer beat the worst finished score). Parity-tested token-for-token
    against torch ``generate(num_beams=5)`` in tests/test_whisper.py.

    Returns ``(tokens (beam, max_len), scores (beam,))`` sorted best-first;
    positions past a sequence's end repeat ``eot``. With the default
    length_penalty=1.0, ``scores[0]`` is the best hypothesis' average
    token log-probability (the faster-whisper fallback statistic).
    """
    cfg = model.cfg
    max_len = max_len or cfg.max_target_positions
    prompt_len = len(sot)
    k = beam
    enc = model.apply(params, mel, method=Whisper.encode)
    enc = jnp.repeat(enc, k, axis=0)  # one beam per row
    self_kv, cross_kv = model.apply(
        params, enc, max_len, method=Whisper.init_cache
    )
    sup = None if suppress is None else jnp.asarray(suppress, bool)
    neg = jnp.float32(-1e9)

    run_seq = jnp.full((k, max_len), eot, jnp.int32)
    run_seq = run_seq.at[:, :prompt_len].set(
        jnp.asarray(sot, jnp.int32)[None]
    )
    run_scores = jnp.full((k,), -1e9, jnp.float32).at[0].set(0.0)
    fin_seq = run_seq
    fin_scores = jnp.full((k,), -1e9, jnp.float32)
    fin_done = jnp.zeros((k,), bool)
    top_mask = jnp.arange(2 * k) < k  # only top-k ranks may finalize

    # Prompt phase: feed the forced tokens through the cache (identical on
    # every beam); the last prompt position's logits seed the first free
    # step inside the loop.
    for pos in range(prompt_len - 1):
        _, self_kv = model.apply(
            params, run_seq[:, pos], pos, self_kv, cross_kv,
            method=Whisper.decode_step,
        )

    def cond(state):
        _, _, _, _, _, stop, pos, _ = state
        return (pos + 1 < max_len) & ~stop

    def body(state):
        (run_seq, run_scores, fin_seq, fin_scores, fin_done, _, pos,
         self_kv) = state
        logits, self_kv = model.apply(
            params, run_seq[:, pos], pos, self_kv, cross_kv,
            method=Whisper.decode_step,
        )  # (k, V)
        logp = jax.nn.log_softmax(logits.astype(jnp.float32), axis=-1)
        if sup is not None:
            logp = jnp.where(sup[None], -jnp.inf, logp)
        v = logp.shape[-1]
        acc = (run_scores[:, None] + logp).reshape(-1)  # (k*V,)
        top_scores, top_idx = jax.lax.top_k(acc, 2 * k)
        beam_src = top_idx // v
        tok = (top_idx % v).astype(jnp.int32)
        top_seq = run_seq[beam_src]
        top_seq = jax.lax.dynamic_update_slice(
            top_seq, tok[:, None], (0, pos + 1)
        )  # (2k, max_len)
        hits = (tok == eot) | (pos + 2 >= max_len)

        # Running beams: best k non-finished continuations.
        sel_scores, sel = jax.lax.top_k(
            top_scores + hits.astype(jnp.float32) * neg, k
        )
        new_run_seq = top_seq[sel]
        src = beam_src[sel]
        new_kv = jax.tree_util.tree_map(lambda x: x[src], self_kv)

        # Finished set: merge newly finalized candidates, keep best k.
        gen_len = (pos + 2 - prompt_len).astype(jnp.float32)
        cand = top_scores / gen_len ** length_penalty
        cand = cand + (~(hits & top_mask)).astype(jnp.float32) * neg
        merged_scores = jnp.concatenate([fin_scores, cand])
        m_scores, msel = jax.lax.top_k(merged_scores, k)
        merged_seq = jnp.concatenate([fin_seq, top_seq])
        merged_done = jnp.concatenate([fin_done, hits & top_mask])
        fin_seq, fin_scores, fin_done = (
            merged_seq[msel], m_scores, merged_done[msel]
        )

        # Early-stop heuristic: can the best running beam still beat the
        # worst finished hypothesis?
        best_possible = sel_scores[0] / gen_len ** length_penalty
        worst_fin = jnp.where(fin_done, jnp.min(fin_scores), neg)
        unsat = jnp.any(best_possible > worst_fin)
        stop = ~(unsat & ~jnp.all(hits))
        return (new_run_seq, sel_scores, fin_seq, fin_scores, fin_done,
                stop, pos + 1, new_kv)

    state = (run_seq, run_scores, fin_seq, fin_scores, fin_done,
             jnp.asarray(False), jnp.asarray(prompt_len - 1), self_kv)
    (_, _, fin_seq, fin_scores, _, _, _, _) = jax.lax.while_loop(
        cond, body, state
    )
    return fin_seq, fin_scores


def sample_decode(model: Whisper, params, mel: jax.Array,
                  sot: np.ndarray, eot: int, key: jax.Array,
                  temperature: float, max_len: int | None = None,
                  suppress: np.ndarray | None = None
                  ) -> tuple[jax.Array, jax.Array]:
    """Temperature-sampled transcription (the faster-whisper fallback
    path: at temperature > 0 decoding drops to single-sequence sampling).

    Returns ``(tokens (B, max_len), avg_logprob (B,))`` where avg_logprob
    averages the sampled tokens' log-probabilities (eot included), the
    statistic the fallback thresholds on."""
    cfg = model.cfg
    max_len = max_len or cfg.max_target_positions
    enc = model.apply(params, mel, method=Whisper.encode)
    self_kv, cross_kv = model.apply(
        params, enc, max_len, method=Whisper.init_cache
    )
    b = enc.shape[0]
    tokens = jnp.full((b, max_len), eot, jnp.int32)
    tokens = tokens.at[:, : len(sot)].set(jnp.asarray(sot, jnp.int32)[None])
    sup = None if suppress is None else jnp.asarray(suppress, bool)

    def cond(state):
        _, pos, done, _, _, _ = state
        return (pos + 1 < max_len) & ~jnp.all(done)

    def body(state):
        tokens, pos, done, self_kv, lp_sum, n_gen = state
        logits, self_kv = model.apply(
            params, tokens[:, pos], pos, self_kv, cross_kv,
            method=Whisper.decode_step,
        )
        logits = logits.astype(jnp.float32)
        if sup is not None:
            logits = jnp.where(sup[None], -jnp.inf, logits)
        logp = jax.nn.log_softmax(logits, axis=-1)
        step_key = jax.random.fold_in(key, pos)
        nxt = jax.random.categorical(
            step_key, logits / jnp.float32(max(temperature, 1e-6)), axis=-1
        ).astype(jnp.int32)
        forced = pos + 1 < len(sot)
        nxt = jnp.where(forced, tokens[:, pos + 1], nxt)
        nxt = jnp.where(done & ~forced, eot, nxt)
        tok_lp = jnp.take_along_axis(logp, nxt[:, None], axis=1)[:, 0]
        live = ~done & ~forced
        lp_sum = lp_sum + jnp.where(live, tok_lp, 0.0)
        n_gen = n_gen + live.astype(jnp.int32)
        tokens = jax.lax.dynamic_update_slice(
            tokens, nxt[:, None], (0, pos + 1)
        )
        done = done | (~forced & (nxt == eot))
        return tokens, pos + 1, done, self_kv, lp_sum, n_gen

    tokens, _, _, _, lp_sum, n_gen = jax.lax.while_loop(
        cond, body,
        (tokens, jnp.asarray(0), jnp.zeros((b,), bool), self_kv,
         jnp.zeros((b,), jnp.float32), jnp.zeros((b,), jnp.int32)),
    )
    return tokens, lp_sum / jnp.maximum(n_gen, 1)


# ---------------------------------------------------------------------------
# Checkpoint import
# ---------------------------------------------------------------------------

_OPENAI_RENAMES = [
    (".attn.query", ".self_attn.q_proj"),
    (".attn.key", ".self_attn.k_proj"),
    (".attn.value", ".self_attn.v_proj"),
    (".attn.out", ".self_attn.out_proj"),
    (".cross_attn.query", ".encoder_attn.q_proj"),
    (".cross_attn.key", ".encoder_attn.k_proj"),
    (".cross_attn.value", ".encoder_attn.v_proj"),
    (".cross_attn.out", ".encoder_attn.out_proj"),
    (".attn_ln", ".self_attn_layer_norm"),
    (".cross_attn_ln", ".encoder_attn_layer_norm"),
    (".mlp_ln", ".final_layer_norm"),
    (".mlp.0", ".fc1"),
    (".mlp.2", ".fc2"),
    (".blocks.", ".layers."),
]


def _normalize_keys(sd: dict) -> dict:
    """OpenAI / HF state-dict naming → HF ``encoder./decoder.`` naming."""
    out = {}
    for k, v in sd.items():
        k = k.removeprefix("model.")
        for old, new in _OPENAI_RENAMES:
            k = k.replace(old, new)
        k = (k.replace("encoder.ln_post", "encoder.layer_norm")
              .replace("decoder.ln.", "decoder.layer_norm.")
              .replace("decoder.token_embedding", "decoder.embed_tokens"))
        if k.endswith("positional_embedding"):  # openai: raw tensor, no .weight
            k = k.replace("positional_embedding", "embed_positions.weight")
        out[k] = np.asarray(v)
    return out


def config_from_state_dict(sd: dict, heads: int | None = None) -> WhisperConfig:
    """Derive the architecture from (normalized) weight shapes.

    ``heads`` defaults to d_model/64, true for every released Whisper; pass
    explicitly for exotic checkpoints (the OpenAI/HF loaders below read it
    from dims/config.json instead).
    """
    d_model, n_mels, _ = sd["encoder.conv1.weight"].shape
    enc_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("encoder.layers.")
    )
    dec_layers = 1 + max(
        int(k.split(".")[2]) for k in sd if k.startswith("decoder.layers.")
    )
    return WhisperConfig(
        vocab_size=sd["decoder.embed_tokens.weight"].shape[0],
        n_mels=n_mels,
        d_model=d_model,
        encoder_layers=enc_layers,
        decoder_layers=dec_layers,
        heads=heads or max(1, d_model // 64),
        ffn=sd["encoder.layers.0.fc1.weight"].shape[0],
        max_source_positions=sd["encoder.embed_positions.weight"].shape[0],
        max_target_positions=sd["decoder.embed_positions.weight"].shape[0],
    )


def convert_whisper(sd: dict, heads: int | None = None):
    """(HF or OpenAI) torch state dict → (WhisperConfig, flax params)."""
    sd = _normalize_keys(sd)
    cfg = config_from_state_dict(sd, heads)

    def dense(prefix, bias=True):
        p = {"kernel": sd[f"{prefix}.weight"].T.astype(np.float32)}
        if bias:
            p["bias"] = sd[f"{prefix}.bias"].astype(np.float32)
        return p

    def ln(prefix):
        return {"scale": sd[f"{prefix}.weight"].astype(np.float32),
                "bias": sd[f"{prefix}.bias"].astype(np.float32)}

    def block(prefix, cross):
        p = {
            "self_attn_layer_norm": ln(f"{prefix}.self_attn_layer_norm"),
            "self_attn": {
                "q_proj": dense(f"{prefix}.self_attn.q_proj"),
                "k_proj": dense(f"{prefix}.self_attn.k_proj", bias=False),
                "v_proj": dense(f"{prefix}.self_attn.v_proj"),
                "out_proj": dense(f"{prefix}.self_attn.out_proj"),
            },
            "final_layer_norm": ln(f"{prefix}.final_layer_norm"),
            "fc1": dense(f"{prefix}.fc1"),
            "fc2": dense(f"{prefix}.fc2"),
        }
        if cross:
            p["encoder_attn_layer_norm"] = ln(
                f"{prefix}.encoder_attn_layer_norm")
            p["encoder_attn"] = {
                "q_proj": dense(f"{prefix}.encoder_attn.q_proj"),
                "k_proj": dense(f"{prefix}.encoder_attn.k_proj", bias=False),
                "v_proj": dense(f"{prefix}.encoder_attn.v_proj"),
                "out_proj": dense(f"{prefix}.encoder_attn.out_proj"),
            }
        return p

    params = {
        "conv1": {
            "kernel": sd["encoder.conv1.weight"].transpose(2, 1, 0)
            .astype(np.float32),
            "bias": sd["encoder.conv1.bias"].astype(np.float32),
        },
        "conv2": {
            "kernel": sd["encoder.conv2.weight"].transpose(2, 1, 0)
            .astype(np.float32),
            "bias": sd["encoder.conv2.bias"].astype(np.float32),
        },
        "enc_positions": sd["encoder.embed_positions.weight"]
        .astype(np.float32),
        "enc_ln": ln("encoder.layer_norm"),
        "embed_tokens": {
            "embedding": sd["decoder.embed_tokens.weight"].astype(np.float32)
        },
        "dec_positions": sd["decoder.embed_positions.weight"]
        .astype(np.float32),
        "dec_ln": ln("decoder.layer_norm"),
    }
    for i in range(cfg.encoder_layers):
        params[f"enc_blocks_{i}"] = block(f"encoder.layers.{i}", cross=False)
    for i in range(cfg.decoder_layers):
        params[f"dec_blocks_{i}"] = block(f"decoder.layers.{i}", cross=True)
    return cfg, {"params": jax.tree.map(jnp.asarray, params)}


def load_whisper(path: str | Path):
    """Load a Whisper checkpoint → (WhisperConfig, params, model_dir).

    ``path`` may be an OpenAI ``.pt`` file ({"dims", "model_state_dict"}),
    an HF directory (config.json + pytorch_model.bin), or a bare torch
    state-dict file.
    """
    import torch

    path = Path(path)
    heads = None
    if path.is_dir():
        cfg_file = path / "config.json"
        if cfg_file.exists():
            heads = json.loads(cfg_file.read_text()).get(
                "decoder_attention_heads")
        blob = None
        for name in ("pytorch_model.bin", "whisper.pt", "model.pt"):
            if (path / name).exists():
                blob = torch.load(path / name, map_location="cpu",
                                  weights_only=False)
                break
        if blob is None and (path / "model.safetensors").exists():
            from safetensors.numpy import load_file

            blob = load_file(path / "model.safetensors")
        if blob is None:
            raise FileNotFoundError(f"no weight file under {path}")
        model_dir = path
    else:
        blob = torch.load(path, map_location="cpu", weights_only=False)
        model_dir = path.parent
    if isinstance(blob, dict) and "model_state_dict" in blob:
        heads = blob.get("dims", {}).get("n_audio_head", heads)
        blob = blob["model_state_dict"]
    if isinstance(blob, dict) and "state_dict" in blob:
        blob = blob["state_dict"]
    sd = {k: v.detach().cpu().numpy() if hasattr(v, "detach") else v
          for k, v in blob.items()}
    cfg, params = convert_whisper(sd, heads)
    return cfg, params, model_dir


# ---------------------------------------------------------------------------
# Detokenizer
# ---------------------------------------------------------------------------

def _byte_decoder() -> dict:
    """Inverse of GPT-2's bytes_to_unicode: printable char → raw byte."""
    bs = (list(range(ord("!"), ord("~") + 1))
          + list(range(ord("¡"), ord("¬") + 1))
          + list(range(ord("®"), ord("ÿ") + 1)))
    cs = bs[:]
    n = 0
    for b in range(256):
        if b not in bs:
            bs.append(b)
            cs.append(256 + n)
            n += 1
    return {chr(c): b for b, c in zip(bs, cs)}


class ByteBpeDecoder:
    """Decode-only GPT-2 byte-level BPE (Whisper's tokenizer family).

    Built from vocab.json (token string → id); special ``<|...|>`` tokens
    are dropped from text output. Encoding needs the merge table and is
    not required for transcription.
    """

    def __init__(self, vocab: dict[str, int]):
        self.id_to_token = {i: t for t, i in vocab.items()}
        self.byte_dec = _byte_decoder()
        self.specials = {
            i for t, i in vocab.items()
            if t.startswith("<|") and t.endswith("|>")
        }
        self.vocab = vocab

    @classmethod
    def from_dir(cls, model_dir: str | Path) -> "ByteBpeDecoder":
        model_dir = Path(model_dir)
        vocab = json.loads((model_dir / "vocab.json").read_text())
        added = model_dir / "added_tokens.json"
        if added.exists():
            vocab.update(json.loads(added.read_text()))
        return cls(vocab)

    def decode(self, ids) -> str:
        chunks = []
        for i in ids:
            i = int(i)
            if i in self.specials or i not in self.id_to_token:
                continue
            chunks.append(self.id_to_token[i])
        data = bytes(
            self.byte_dec.get(ch, ord("?") if ord(ch) > 255 else ord(ch))
            for ch in "".join(chunks)
        )
        return data.decode("utf-8", errors="replace")

    def sot_sequence(self, language: str = "en") -> list[int]:
        """[sot(, lang, transcribe), notimestamps] — language/task tokens
        included only for multilingual vocabularies (openai tokenizer.py
        semantics: English-only models condition on sot alone).

        Multilingual is detected by the released sot id (50258; English-
        only models use 50257) rather than tokenizer-file length, which
        undercounts when timestamp tokens are handled in code instead of
        added_tokens.json."""
        v = self.vocab
        sot = v["<|startoftranscript|>"]
        seq = [sot]
        multilingual = sot == 50258 or (sot != 50257 and len(v) >= 51865)
        if multilingual and f"<|{language}|>" in v and "<|transcribe|>" in v:
            seq += [v[f"<|{language}|>"], v["<|transcribe|>"]]
        if "<|notimestamps|>" in v:
            seq.append(v["<|notimestamps|>"])
        return seq

    def eot(self) -> int:
        return self.vocab["<|endoftext|>"]

    def suppress_mask(self) -> np.ndarray:
        """Boolean (vocab,) mask: never emit specials (except eot) —
        keeps greedy decoding on the text path without timestamp logic."""
        mask = np.zeros(
            max(self.vocab.values()) + 1, bool
        )
        for i in self.specials:
            mask[i] = True
        mask[self.eot()] = False
        return mask


# ---------------------------------------------------------------------------
# Transcriber factory (tracker extra_text contract)
# ---------------------------------------------------------------------------

def _compression_ratio(text: str) -> float:
    """zlib compression ratio — the faster-whisper repetition detector
    (ratios > ~2.4 mean the decoder is looping)."""
    import zlib

    data = text.encode("utf-8")
    if not data:
        return 0.0
    return len(data) / len(zlib.compress(data))


def make_whisper_transcriber(model_path: str | Path,
                             language: str = "en",
                             max_new_tokens: int = 224,
                             beam_size: int | None = None,
                             temperatures=(0.0, 0.2, 0.4, 0.6, 0.8, 1.0),
                             compression_ratio_threshold: float = 2.4,
                             log_prob_threshold: float = -1.0):
    """Native replacement for sidecars.make_whisper_asr: loads a Whisper
    checkpoint (HF dir or OpenAI .pt; vocab.json beside it) and returns
    ``fn(audio, sample_rate) -> str``. Long audio runs a >30 s sliding-
    window loop (one window per 30 s chunk, faster-whisper's seek step
    with notimestamps).

    ``beam_size=None`` is the fast greedy path; ``beam_size=5`` matches
    faster-whisper's default decoder (metrics/asr.py:3-12): beam search at
    temperature 0.0, then per-window TEMPERATURE FALLBACK — if the best
    hypothesis' avg token log-prob is below ``log_prob_threshold`` or its
    text zlib-compression ratio exceeds ``compression_ratio_threshold``,
    re-decode by sampling at the next temperature in ``temperatures``.
    """
    cfg, params, model_dir = load_whisper(model_path)
    tok = ByteBpeDecoder.from_dir(model_dir)
    model = Whisper(cfg)
    sot = np.asarray(tok.sot_sequence(language), np.int32)
    eot = tok.eot()
    suppress = tok.suppress_mask()
    if len(suppress) < cfg.vocab_size:
        # Ids beyond the tokenizer files (typically the timestamp block)
        # are undecodable — suppress them too.
        suppress = np.pad(
            suppress, (0, cfg.vocab_size - len(suppress)),
            constant_values=True,
        )
    sup = suppress[: cfg.vocab_size]
    max_len = min(cfg.max_target_positions, len(sot) + max_new_tokens)
    # 2 mel frames per encoder position (the stride-2 conv); released
    # models: 1500 positions ↔ 3000 frames ↔ 30 s at 16 kHz.
    chunk_samples = 2 * cfg.max_source_positions * HOP

    # ONE jitted program per 30 s window per decode mode: log-mel
    # frontend + encoder + KV-cached decode (the remote backend pays per
    # round trip, so the frontend must not dispatch op-by-op).
    @jax.jit
    def mel_and_greedy(p, chunk):
        mel = log_mel(chunk[None], cfg.n_mels)
        return greedy_decode(model, p, mel, sot, eot, max_len, sup)

    @jax.jit
    def mel_and_beam(p, chunk):
        mel = log_mel(chunk[None], cfg.n_mels)
        return beam_decode(
            model, p, mel, sot, eot, beam_size or 5, max_len, sup
        )

    @partial(jax.jit, static_argnames=("temperature",))
    def mel_and_sample(p, chunk, key, temperature):
        mel = log_mel(chunk[None], cfg.n_mels)
        return sample_decode(
            model, p, mel, sot, eot, key, temperature, max_len, sup
        )

    def _trim(ids) -> str:
        keep = np.asarray(ids)[len(sot):]
        stop = np.nonzero(keep == eot)[0]
        if stop.size:
            keep = keep[: stop[0]]
        return tok.decode(keep).strip()

    def _decode_window(chunk, seed: int) -> str:
        if beam_size is None:
            return _trim(np.asarray(mel_and_greedy(params, chunk))[0])
        for t_i, temp in enumerate(temperatures):
            if temp == 0.0:
                seqs, scores = mel_and_beam(params, chunk)
                text = _trim(seqs[0])
                avg_lp = float(scores[0])
            else:
                key = jax.random.PRNGKey(seed * 1009 + t_i)
                seqs, lps = mel_and_sample(params, chunk, key, float(temp))
                text = _trim(seqs[0])
                avg_lp = float(lps[0])
            if (
                avg_lp >= log_prob_threshold
                and _compression_ratio(text) <= compression_ratio_threshold
            ):
                return text
        return text  # all temperatures failed: keep the last attempt

    def transcribe(audio, sample_rate: int = SAMPLE_RATE) -> str:
        audio = np.asarray(audio, np.float32).reshape(-1)
        if sample_rate != SAMPLE_RATE:
            from ..utils.wavio import resample

            audio = resample(audio, sample_rate, SAMPLE_RATE)
        texts = []
        for w, start in enumerate(
            range(0, max(len(audio), 1), chunk_samples)
        ):
            chunk = jnp.asarray(pad_or_trim(
                audio[start: start + chunk_samples], chunk_samples
            ))
            texts.append(_decode_window(chunk, w))
        return " ".join(t for t in texts if t).strip()

    return transcribe
