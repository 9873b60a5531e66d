"""Batched throughput engine: device frame batches + host entropy pool.

The dataset-scale path (``compress_datalist`` / ``decompress_datalist``):
frames are stacked into fixed-shape (B, N, 3) batches, encoded by one sharded
XLA program, and the byte-level entropy stage runs on a host thread pool
(stdlib codecs release the GIL) overlapped with the next device batch via
JAX's async dispatch.
"""

from __future__ import annotations

import concurrent.futures as futures
from typing import Dict, List, Optional, Sequence, Tuple

import jax
import numpy as np

from rpcc_tpu.codec.bitstream import pack_bitstream, unpack_bitstream
from rpcc_tpu.codec.entropy import BasicCompressor
from rpcc_tpu.config import CodecConfig, LidarConfig
from rpcc_tpu.models.decoder import make_batch_decoder
from rpcc_tpu.models.encoder import make_batch_encoder
from rpcc_tpu.models.pipeline import PAD_QUANTUM


def _bucket(n: int, cap: int, quantum: int = 8192) -> int:
    """Round a live length up to a transfer bucket (bounded slice variants)."""
    return min(cap, max(quantum, -(-n // quantum) * quantum))


class BatchEngine:
    def __init__(
        self,
        lidar: LidarConfig,
        cfg: CodecConfig,
        batch_size: int = 8,
        mesh=None,
        workers: int = 4,
    ):
        self.lidar = lidar
        self.cfg = cfg
        if mesh is not None:
            n_dev = int(mesh.devices.size)
            batch_size = -(-batch_size // n_dev) * n_dev  # shardable batch
        self.batch_size = batch_size
        self.mesh = mesh
        self.H, self.W = lidar.height, lidar.width
        self.hw = self.H * self.W
        self._encode_b = make_batch_encoder(lidar, cfg, mesh)
        self._decode_b = make_batch_decoder(lidar, cfg, mesh)
        self.entropy = BasicCompressor(
            method_name=cfg.basic_compressor, contour_shape=(self.H, self.W)
        )
        self._pool = futures.ThreadPoolExecutor(workers)
        # Dedicated uploader: stacking + host->device transfer is mostly IO
        # wait, so it overlaps the entropy stage even on a 1-core host.
        self._uploader = futures.ThreadPoolExecutor(1)

    @property
    def _step_arg(self) -> np.ndarray:
        if self.cfg.uniform:
            return np.float32(self.cfg.step)
        return np.asarray(self.cfg.level_acc, dtype=np.float32)

    # ---------------------------------------------------------------- encode
    def _stack(self, clouds: Sequence[np.ndarray]) -> Tuple[np.ndarray, int]:
        n_max = max(c.shape[0] for c in clouds)
        n_pad = max(PAD_QUANTUM, ((n_max + PAD_QUANTUM - 1) // PAD_QUANTUM) * PAD_QUANTUM)
        b = self.batch_size
        out = np.zeros((b, n_pad, 3), np.float32)
        for i, c in enumerate(clouds):
            out[i, : c.shape[0]] = np.asarray(c, np.float32)[:, :3]
        return out, len(clouds)

    def encode_batch_device(self, clouds: Sequence[np.ndarray], seeds: Optional[Sequence[int]] = None):
        """Dispatch one device batch (async); returns (EncoderOutput, live_count)."""
        assert len(clouds) <= self.batch_size
        pts, live = self._stack(clouds)
        if seeds is None:
            seeds = [self.cfg.seed] * self.batch_size
        seeds = np.asarray(
            list(seeds) + [self.cfg.seed] * (self.batch_size - len(seeds)), np.uint32
        )
        return self._encode_b(pts, seeds, self._step_arg), live

    def finalize_encoded(self, out, live: int) -> List[Tuple[bytes, Dict[str, np.ndarray]]]:
        """Trim per-frame fields + entropy-code them on the thread pool."""
        out = jax.block_until_ready(out)
        stream_len = np.asarray(out.stream_len)
        seq_len = np.asarray(out.seq_len)
        # Download only the live prefixes (bucketed so the slice programs
        # stay cached): the padded sequence alone is 8MB/batch for ~12KB of
        # runs, and this rig's download path is the e2e bottleneck.
        m_stream = _bucket(int(stream_len.max()) if stream_len.size else 1, self.hw)
        m_seq = _bucket(int(seq_len.max()) if seq_len.size else 1, self.hw)
        stream = np.asarray(out.stream[:, :m_stream])
        seq = np.asarray(out.sequence[:, :m_seq])
        contour_packed = np.asarray(out.contour_packed)
        models = np.asarray(out.model_param)
        salience = None if out.salience is None else np.asarray(out.salience)

        # With the device rANS coder, the dominant fields (residual stream,
        # contour bit plane) for the whole batch are entropy-coded in one
        # device call each; the small remaining fields go to the host pool.
        resid_blobs = None
        contour_blobs = None
        seq_blobs = None
        if self.cfg.basic_compressor == "rans":
            import bz2 as _bz2

            from rpcc_tpu.codec import rans_codec

            resid_blobs = rans_codec.compress_delta_batch(
                [stream[i, : stream_len[i]].astype(np.int16) for i in range(live)]
            )
            contour_blobs = rans_codec.compress_contour_batch(
                [contour_packed[i] for i in range(live)], self.H, self.W
            )
            seqs = [seq[i, : seq_len[i]].astype(np.uint16) for i in range(live)]
            seq_delta = rans_codec.compress_delta_batch(seqs)
            seq_blobs = [
                min(d, bytes([rans_codec.MAGIC_BZ]) + _bz2.compress(s.tobytes()), key=len)
                for d, s in zip(seq_delta, seqs)
            ]

        def one(i: int) -> Tuple[bytes, Dict[str, np.ndarray]]:
            fields = {
                "residual_quantized": stream[i, : stream_len[i]].astype(np.int16),
                "contour_map": contour_packed[i],
                "idx_sequence": seq[i, : seq_len[i]],
                "plane_param": models[i].astype(np.float32),
            }
            if salience is not None:
                fields["salience_level"] = salience[i].astype(np.uint8)
            if resid_blobs is None:
                compressed = self.entropy.compress_dict(fields)
            else:
                batched = ("residual_quantized", "contour_map", "idx_sequence")
                compressed = self.entropy.compress_dict(
                    {k: v for k, v in fields.items() if k not in batched}
                )
                compressed["residual_quantized"] = resid_blobs[i]
                compressed["contour_map"] = contour_blobs[i]
                compressed["idx_sequence"] = seq_blobs[i]
            return pack_bitstream(compressed, uniform=self.cfg.uniform), fields

        return list(self._pool.map(one, range(live)))

    def encode_batch_async(self, clouds: Sequence[np.ndarray], seeds=None):
        """Stack + upload + dispatch on the uploader thread; returns a
        future resolving to (EncoderOutput, live_count)."""
        return self._uploader.submit(self.encode_batch_device, clouds, seeds)

    def encode_frames(self, clouds: Sequence[np.ndarray], seeds=None):
        """Convenience: one synchronous batch -> list of .rpcc payloads."""
        out, live = self.encode_batch_device(clouds, seeds)
        return self.finalize_encoded(out, live)

    # ---------------------------------------------------------------- decode
    def decode_blobs_device(self, blobs: Sequence[bytes]):
        """Entropy-decode + stack + dispatch one device decode batch."""
        assert len(blobs) <= self.batch_size
        b = self.batch_size
        hw = self.hw
        from rpcc_tpu.models.encoder import num_model_rows

        nm = num_model_rows(self.cfg)
        contour = np.zeros((b, hw // 8), np.uint8)  # packed; device unpacks
        seq = np.zeros((b, hw), np.int32)
        stream = np.zeros((b, hw), np.int32)
        models = np.zeros((b, nm, 4), np.float32)
        sal = np.zeros((b, nm), np.int32)

        packed = [unpack_bitstream(b, uniform=self.cfg.uniform) for b in blobs]
        resid_bytes = None
        contour_bytes = None
        if self.cfg.basic_compressor == "rans":
            from rpcc_tpu.codec import rans_codec

            resid_bytes = rans_codec.decompress_delta_batch(
                [p["residual_quantized"] for p in packed]
            )
            if all(p["contour_map"][0] == rans_codec.MAGIC_BITS for p in packed):
                contour_bytes = rans_codec.decompress_contour_batch(
                    [p["contour_map"] for p in packed]
                )

        def one(i: int):
            skip = {"residual_quantized"} if resid_bytes is not None else set()
            if contour_bytes is not None:
                skip.add("contour_map")
            fields = {
                k: self.entropy.decompress(v)
                for k, v in packed[i].items()
                if k not in skip
            }
            if resid_bytes is not None:
                fields["residual_quantized"] = resid_bytes[i]
            if contour_bytes is not None:
                fields["contour_map"] = contour_bytes[i]
            contour[i] = np.frombuffer(fields["contour_map"], np.uint8)
            s = np.frombuffer(fields["idx_sequence"], np.uint16).astype(np.int32)
            seq[i, : s.shape[0]] = s
            q = np.frombuffer(fields["residual_quantized"], np.int16).astype(np.int32)
            stream[i, : q.shape[0]] = q
            m = np.frombuffer(fields["plane_param"], np.float32).reshape(-1, 4)
            models[i, : m.shape[0]] = m
            if "salience_level" in fields:
                sal[i] = np.frombuffer(fields["salience_level"], np.uint8).astype(np.int32)

        list(self._pool.map(one, range(len(blobs))))
        if self.cfg.uniform:
            dec = self._decode_b(contour, seq, stream, models, self._step_arg)
        else:
            dec = self._decode_b(contour, seq, stream, models, self._step_arg, sal)
        return dec, len(blobs)

    def decode_blobs(self, blobs: Sequence[bytes]) -> List[np.ndarray]:
        dec, live = self.decode_blobs_device(blobs)
        dec = jax.block_until_ready(dec)
        # Download the (B, H, W) range image, NOT the (B, H, W, 3) cloud: a
        # trailing dim of 3 is tile-padded to 128 on TPU, making its download
        # ~42x larger over the wire; back-projection is one host multiply.
        ris = np.asarray(dec.range_image)
        if not hasattr(self, "_tm_np"):
            from rpcc_tpu.ops.projection import build_transform_map

            self._tm_np = build_transform_map(self.lidar)
        return [ris[i][..., None] * self._tm_np for i in range(live)]
