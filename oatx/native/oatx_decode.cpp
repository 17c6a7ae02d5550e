// oatx_decode — first-party video decode library (FFmpeg/libav).
//
// TPU-native replacement for the reference's OpenCV/decord/PyAV readers
// (/root/reference/OATrans/base/base_dataset.py:503-552 behavior): probe a
// container for frame count, then decode an arbitrary list of frame indices to
// packed RGB24, optionally resizing so the short side equals a target (the
// device-side augmentation pipeline takes over from there). Designed for
// many-worker host pipelines: no global state, errors returned as codes
// (callers resample/skip — "lax" loading).
//
// Perf design (host decode is the pacing item for chip saturation — PERF.md
// "Integrated input-pipeline"):
//   * Handle API: ONE avformat_open_input + find_stream_info per clip instead
//     of three (probe / out_size / decode each reopened in the v0.1 ABI).
//   * Color-convert/resize (sws_scale) runs ONLY for requested indices; the
//     lax end-of-stream fill keeps a refcounted AVFrame and scales once.
//   * Intra-only codecs (MJPEG et al., AV_CODEC_PROP_INTRA_ONLY): packets for
//     unwanted frame indices are never sent to the decoder at all — sampling
//     4 of 64 frames skips ~94% of the JPEG decode work. A sequential-decode
//     fallback preserves exact semantics if the skip path comes up short.
//
// Also includes a tiny MJPEG/AVI test-clip writer so the framework can
// synthesize fixture videos hermetically (no ffmpeg CLI in the image).
//
// C ABI for ctypes. Build: see oatx/native/Makefile.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libavutil/opt.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct LogQuiet {
  LogQuiet() { av_log_set_level(AV_LOG_ERROR); }
} log_quiet_init;

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;
  int64_t nframes = 0;   // best-effort frame count
  double fps = 0.0;
  AVRational frame_rate = {0, 1};
  int width = 0, height = 0;
  std::string path;      // for reopen when the container can't seek back
  bool at_start = true;  // stream position is frame 0 and codec is fresh

  ~Decoder() { close(); }

  void close() {
    if (codec) avcodec_free_context(&codec);
    if (fmt) avformat_close_input(&fmt);
    codec = nullptr;
    fmt = nullptr;
  }
};

int open_decoder(const char* path, Decoder* d) {
  d->path = path;
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) return -1;
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) return -2;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, nullptr, 0);
  if (d->stream_index < 0) return -3;
  AVStream* st = d->fmt->streams[d->stream_index];
  const AVCodec* dec = avcodec_find_decoder(st->codecpar->codec_id);
  if (!dec) return -4;
  d->codec = avcodec_alloc_context3(dec);
  if (!d->codec) return -5;
  if (avcodec_parameters_to_context(d->codec, st->codecpar) < 0) return -6;
  d->codec->thread_count = 1;  // parallelism lives at the worker level
  if (avcodec_open2(d->codec, dec, nullptr) < 0) return -7;

  d->width = d->codec->width;
  d->height = d->codec->height;
  AVRational fr = st->avg_frame_rate.num ? st->avg_frame_rate : st->r_frame_rate;
  d->frame_rate = fr;
  d->fps = fr.den ? av_q2d(fr) : 0.0;
  d->nframes = st->nb_frames;
  if (d->nframes <= 0 && d->fps > 0 && d->fmt->duration > 0) {
    d->nframes = (int64_t)(d->fmt->duration * d->fps / AV_TIME_BASE);
  }
  d->at_start = true;
  return 0;
}

// Rewind to frame 0 with a fresh codec state; reopens the container when it
// cannot seek (the handle API allows info → decode → decode on one handle).
int rewind_decoder(Decoder* d) {
  if (d->at_start) return 0;
  if (av_seek_frame(d->fmt, d->stream_index, 0, AVSEEK_FLAG_BACKWARD) >= 0 ||
      av_seek_frame(d->fmt, d->stream_index, 0,
                    AVSEEK_FLAG_BACKWARD | AVSEEK_FLAG_BYTE) >= 0) {
    avcodec_flush_buffers(d->codec);
    d->at_start = true;
    return 0;
  }
  std::string path = d->path;
  d->close();
  return open_decoder(path.c_str(), d);
}

void compute_out_size(int w, int h, int short_side, int* ow, int* oh) {
  if (short_side <= 0) { *ow = w; *oh = h; return; }
  if (w <= h) {
    *ow = short_side;
    *oh = (int)((int64_t)h * short_side / w);
  } else {
    *oh = short_side;
    *ow = (int)((int64_t)w * short_side / h);
  }
  *ow &= ~1;  // keep even for swscale friendliness
  *oh &= ~1;
  if (*ow == 0) *ow = 2;
  if (*oh == 0) *oh = 2;
}

// Shared state for one decode-indices call.
struct IndexDecode {
  Decoder* d;
  const int64_t* indices;  // caller's order, duplicates allowed
  int n;
  uint8_t* out;
  int ow, oh;
  SwsContext* sws = nullptr;
  size_t frame_bytes;
  std::vector<uint8_t> rgb;         // scratch for one scaled frame
  std::vector<bool> slot_filled;
  int unfilled;
  AVFrame* last = nullptr;          // refcounted most-recent decoded frame
  int64_t last_idx = -1;

  IndexDecode(Decoder* dec, const int64_t* idx, int count, uint8_t* buf,
              int w, int h)
      : d(dec), indices(idx), n(count), out(buf), ow(w), oh(h),
        frame_bytes((size_t)w * h * 3), rgb((size_t)w * h * 3),
        slot_filled(count, false), unfilled(count) {
    last = av_frame_alloc();
  }
  ~IndexDecode() {
    if (sws) sws_freeContext(sws);
    if (last) av_frame_free(&last);
  }

  bool ensure_sws() {
    if (!sws) {
      sws = sws_getContext(d->width, d->height, d->codec->pix_fmt, ow, oh,
                           AV_PIX_FMT_RGB24, SWS_BILINEAR, nullptr, nullptr,
                           nullptr);
    }
    return sws != nullptr;
  }

  // Scale `frame` once and copy into every slot that wants index `idx`.
  // No-op (no color convert) when nothing wants it — the sequential path
  // calls this for every decoded frame, and the whole point of v2 is that
  // sws_scale runs only for requested indices.
  bool deliver(int64_t idx, AVFrame* frame) {
    bool want = false;
    for (int j = 0; j < n && !want; j++) {
      want = indices[j] == idx && !slot_filled[j];
    }
    if (!want) return true;
    if (!ensure_sws()) return false;
    uint8_t* dst[1] = {rgb.data()};
    int dst_stride[1] = {ow * 3};
    sws_scale(sws, frame->data, frame->linesize, 0, d->height, dst, dst_stride);
    for (int j = 0; j < n; j++) {
      if (indices[j] == idx && !slot_filled[j]) {
        std::memcpy(out + (size_t)j * frame_bytes, rgb.data(), frame_bytes);
        slot_filled[j] = true;
        unfilled--;
      }
    }
    return true;
  }

  void remember(int64_t idx, AVFrame* frame) {
    av_frame_unref(last);
    av_frame_ref(last, frame);
    last_idx = idx;
  }

  // Lax fill: any still-unfilled slot (index beyond the stream) gets the most
  // recent decoded frame (reference read_frames semantics: clamp to the end).
  bool fill_remainder_from_last() {
    if (unfilled == 0) return true;
    if (last_idx < 0 || !ensure_sws()) return false;
    uint8_t* dst[1] = {rgb.data()};
    int dst_stride[1] = {ow * 3};
    sws_scale(sws, last->data, last->linesize, 0, d->height, dst, dst_stride);
    for (int j = 0; j < n; j++) {
      if (!slot_filled[j]) {
        std::memcpy(out + (size_t)j * frame_bytes, rgb.data(), frame_bytes);
        slot_filled[j] = true;
        unfilled--;
      }
    }
    return true;
  }
};

// Sequential scan: decode every frame up to max_index, scaling only wanted
// ones. Exact v0.1 semantics; works for any codec.
int decode_sequential(IndexDecode& ix, int64_t max_index) {
  Decoder* d = ix.d;
  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t idx = 0;
  bool done = false;
  while (!done && av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index == d->stream_index && pkt->size > 0) {
      d->at_start = false;
      if (avcodec_send_packet(d->codec, pkt) == 0) {
        while (avcodec_receive_frame(d->codec, frame) == 0) {
          ix.deliver(idx, frame);
          ix.remember(idx, frame);
          if (++idx > max_index) { done = true; break; }
        }
      }
    }
    av_packet_unref(pkt);
  }
  if (!done) {  // flush
    avcodec_send_packet(d->codec, nullptr);
    while (avcodec_receive_frame(d->codec, frame) == 0) {
      ix.deliver(idx, frame);
      ix.remember(idx, frame);
      if (++idx > max_index) break;
    }
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  if (ix.last_idx < 0) return -102;  // nothing decodable at all
  ix.fill_remainder_from_last();
  return ix.n - ix.unfilled;
}

// Intra-only fast path: every packet is independently decodable, so packets
// for unwanted indices are skipped without touching the codec. Keeps the last
// seen packet so out-of-range indices can still be lax-filled with the true
// final frame. Returns <0 if the caller should fall back to the sequential
// path (delayed decoder output — not expected for intra codecs, but exactness
// is guaranteed by construction, not by assumption).
int decode_intra_skip(IndexDecode& ix, const std::vector<int64_t>& wanted) {
  Decoder* d = ix.d;
  AVPacket* pkt = av_packet_alloc();
  AVPacket* last_pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t last_pkt_idx = -1;
  size_t next = 0;  // into sorted-unique `wanted`
  int64_t idx = 0;
  bool short_output = false;

  while (next < wanted.size() && av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index != d->stream_index) {
      av_packet_unref(pkt);
      continue;
    }
    d->at_start = false;
    if (pkt->size == 0) {
      // zero-size drop-frame packets (AVI A/V-sync padding) decode to no
      // frame — the sequential path numbers by DECODED frames, so skipping
      // them here keeps both paths on the same index space
      av_packet_unref(pkt);
      continue;
    }
    if (idx == wanted[next]) {
      bool got = false;
      if (avcodec_send_packet(d->codec, pkt) == 0) {
        while (avcodec_receive_frame(d->codec, frame) == 0) {
          ix.deliver(idx, frame);
          ix.remember(idx, frame);
          got = true;
        }
      }
      if (!got) { short_output = true; av_packet_unref(pkt); break; }
      next++;
    } else {
      av_packet_unref(last_pkt);
      av_packet_ref(last_pkt, pkt);
      last_pkt_idx = idx;
    }
    idx++;
    av_packet_unref(pkt);
  }

  int result;
  if (short_output) {
    result = -1;  // decoder held the frame back: not truly delay-free
  } else {
    // EOF before all wanted indices: lax-fill from the true final stream
    // frame, which may be a packet we skipped.
    if (ix.unfilled > 0 && last_pkt_idx > ix.last_idx) {
      if (avcodec_send_packet(d->codec, last_pkt) == 0) {
        while (avcodec_receive_frame(d->codec, frame) == 0) {
          ix.deliver(last_pkt_idx, frame);
          ix.remember(last_pkt_idx, frame);
        }
      }
    }
    if (ix.last_idx < 0) {
      result = -102;  // nothing decodable at all
    } else {
      ix.fill_remainder_from_last();
      result = ix.n - ix.unfilled;
    }
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  av_packet_free(&last_pkt);
  return result;
}

// Pull the next decoded frame in presentation order. Returns 1 when a frame
// was produced, 0 at stream end. `draining` tracks whether the EOF flush
// packet has been sent (reset it after every avcodec_flush_buffers).
int next_frame(Decoder* d, AVPacket* pkt, AVFrame* frame, bool* draining) {
  while (true) {
    int rc = avcodec_receive_frame(d->codec, frame);
    if (rc == 0) return 1;
    if (rc == AVERROR_EOF) return 0;
    // decoder wants more input (empty drop-frame packets are demux padding,
    // and an empty payload through send_packet reads as a flush signal)
    while ((rc = av_read_frame(d->fmt, pkt)) >= 0 &&
           (pkt->stream_index != d->stream_index || pkt->size == 0)) {
      av_packet_unref(pkt);
    }
    if (rc >= 0) {
      d->at_start = false;
      avcodec_send_packet(d->codec, pkt);
      av_packet_unref(pkt);
    } else if (!*draining) {
      avcodec_send_packet(d->codec, nullptr);
      *draining = true;
    } else {
      return 0;
    }
  }
}

// Inter-codec fast path (H.264/MPEG-4 class): for each wanted index, seek to
// the nearest preceding keyframe and decode forward only from there —
// decoding 4 sampled frames of a 300-frame clip costs ~4 half-GOPs instead of
// the whole prefix. Frame identity comes from presentation timestamps
// (CFR index = round(pts_seconds * fps)); any anomaly (no pts, seek failure,
// landing past the target) returns <0 so the caller falls back to the exact
// sequential scan. Keyframe-exact decode means output is byte-identical to
// the sequential path for conformant closed-GOP streams.
int decode_seek_stepping(IndexDecode& ix, const std::vector<int64_t>& wanted) {
  Decoder* d = ix.d;
  AVStream* st = d->fmt->streams[d->stream_index];
  // index math prefers r_frame_rate: avg_frame_rate is nb_frames/duration and
  // some containers (mp4) bias it by one frame interval (120 frames over a
  // 119-tick duration → 12.1 "fps"), which mis-maps pts→index near clip end;
  // r_frame_rate is defined as the rate representing all timestamps exactly
  AVRational rate = st->r_frame_rate;
  if (rate.num <= 0 || rate.den <= 0) rate = d->frame_rate;
  if (rate.num <= 0 || rate.den <= 0) return -1;
  // AVI stores no real pts (demuxer fabricates pts=dts): with B-frame
  // reordering every timestamp is shifted by the codec delay and pts→index
  // alignment would deliver wrong-by-delay frames. Sequential only.
  const char* ifname = d->fmt->iformat ? d->fmt->iformat->name : "";
  if (d->codec->has_b_frames > 0 && ifname && std::strstr(ifname, "avi")) {
    return -1;
  }
  const double index_fps = av_q2d(rate);
  const AVRational tick = {rate.den, rate.num};  // seconds per frame
  const double tb_sec = av_q2d(st->time_base);
  const int64_t start_ts =
      st->start_time != AV_NOPTS_VALUE ? st->start_time : 0;
  // decode-forward distance below which seeking isn't worth it (also keeps
  // dense index lists on the pure forward path)
  const int64_t SEEK_AHEAD = 16;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  bool draining = false;
  bool aligned = d->at_start;  // `cur` trustworthy without reading a pts
  int64_t cur = 0;             // index of the next frame decode will deliver
  bool eof = false;
  int fail = 0;

  for (size_t wi = 0; wi < wanted.size() && !eof && !fail; wi++) {
    const int64_t t = wanted[wi];
    if (!aligned || t >= cur + SEEK_AHEAD) {
      int64_t ts = start_ts + av_rescale_q(t, tick, st->time_base);
      if (av_seek_frame(d->fmt, d->stream_index, ts, AVSEEK_FLAG_BACKWARD) < 0) {
        fail = 1;
        break;
      }
      avcodec_flush_buffers(d->codec);
      d->at_start = false;
      draining = false;
      aligned = false;
    }
    while (!eof && !fail) {
      if (!next_frame(d, pkt, frame, &draining)) {
        eof = true;
        break;
      }
      int64_t fidx;
      if (!aligned) {
        int64_t bts = frame->best_effort_timestamp;
        if (bts == AV_NOPTS_VALUE) { fail = 1; break; }
        if (frame->pkt_duration > 0) {  // exact CFR tick count when the codec has it
          fidx = (int64_t)llround((double)(bts - start_ts) / frame->pkt_duration);
        } else {
          fidx = (int64_t)llround((double)(bts - start_ts) * tb_sec * index_fps);
        }
        if (fidx > t) { fail = 1; break; }  // seek landed past the target
        aligned = true;
      } else {
        fidx = cur;
      }
      cur = fidx + 1;
      ix.remember(fidx, frame);
      if (fidx == t) {
        ix.deliver(t, frame);
        break;
      }
      av_frame_unref(frame);
    }
  }

  int result;
  if (fail) {
    result = -1;  // caller rewinds and runs the sequential path
  } else if (ix.last_idx < 0) {
    result = -102;  // nothing decodable at all
  } else {
    // targets beyond the stream: `last` is the true final frame (stepping
    // toward them decoded through to EOF)
    ix.fill_remainder_from_last();
    result = ix.n - ix.unfilled;
  }
  av_frame_free(&frame);
  av_packet_free(&pkt);
  return result;
}

int decode_indices_core(Decoder* d, const int64_t* indices, int n,
                        int short_side, uint8_t* out, int out_w, int out_h) {
  if (n <= 0) return 0;
  int ow, oh;
  compute_out_size(d->width, d->height, short_side, &ow, &oh);
  if (ow != out_w || oh != out_h) return -100;  // caller sized buffer wrong
  if (rewind_decoder(d) != 0) return -103;

  std::vector<int64_t> wanted(indices, indices + n);
  std::sort(wanted.begin(), wanted.end());
  wanted.erase(std::unique(wanted.begin(), wanted.end()), wanted.end());
  int64_t max_index = wanted.back();

  const AVCodecDescriptor* desc = avcodec_descriptor_get(d->codec->codec_id);
  bool intra_only = desc && (desc->props & AV_CODEC_PROP_INTRA_ONLY) &&
                    d->codec->has_b_frames == 0;

  {
    IndexDecode ix(d, indices, n, out, ow, oh);
    if (!ix.ensure_sws()) return -101;
    if (intra_only) {
      int rc = decode_intra_skip(ix, wanted);
      if (rc >= 0 || rc == -102) return rc;
      // fall through: rewind and decode sequentially (exactness over speed)
    } else {
      int rc = decode_seek_stepping(ix, wanted);
      if (rc >= 0 || rc == -102) return rc;
      // fall through likewise (unseekable container, missing pts, …)
    }
  }
  if (rewind_decoder(d) != 0) return -103;
  IndexDecode ix(d, indices, n, out, ow, oh);
  if (!ix.ensure_sws()) return -101;
  return decode_sequential(ix, max_index);
}

int64_t count_frames_by_packets(Decoder* d) {
  if (rewind_decoder(d) != 0) return 0;
  AVPacket* pkt = av_packet_alloc();
  int64_t count = 0;
  while (av_read_frame(d->fmt, pkt) >= 0) {
    if (pkt->stream_index == d->stream_index && pkt->size > 0) count++;
    av_packet_unref(pkt);
  }
  av_packet_free(&pkt);
  d->at_start = false;  // conservatively force a rewind before any decode
  return count;
}

}  // namespace

extern "C" {

// ------------------------------------------------------------- handle API
// One container open serves probe + out_size + decode (the v0.1 path-based
// calls below each reopened the file; datasets do all three per clip).

void* oatx_open(const char* path) {
  Decoder* d = new Decoder();
  if (open_decoder(path, d) != 0) {
    delete d;
    return nullptr;
  }
  return d;
}

void oatx_close(void* h) { delete (Decoder*)h; }

int oatx_handle_info(void* h, int64_t* nframes, double* fps, int* width,
                     int* height) {
  Decoder* d = (Decoder*)h;
  if (d->nframes <= 0) {
    // nb_frames can be 0 for some containers; count via packets as fallback
    // (rewound lazily by the next decode call).
    d->nframes = count_frames_by_packets(d);
  }
  *nframes = d->nframes;
  *fps = d->fps;
  *width = d->width;
  *height = d->height;
  return 0;
}

int oatx_handle_out_size(void* h, int short_side, int* out_w, int* out_h) {
  Decoder* d = (Decoder*)h;
  compute_out_size(d->width, d->height, short_side, out_w, out_h);
  return 0;
}

int oatx_handle_decode(void* h, const int64_t* indices, int n, int short_side,
                       uint8_t* out, int out_w, int out_h) {
  return decode_indices_core((Decoder*)h, indices, n, short_side, out, out_w,
                             out_h);
}

// ------------------------------------------------- path-based API (v0.1 ABI)

// Probe: returns 0 on success; fills nframes/fps/width/height.
int oatx_probe(const char* path, int64_t* nframes, double* fps, int* width,
               int* height) {
  Decoder d;
  int rc = open_decoder(path, &d);
  if (rc != 0) return rc;
  return oatx_handle_info(&d, nframes, fps, width, height);
}

// Output size for a given short-side resize policy (call before decode to size
// the buffer). Returns 0 on success.
int oatx_out_size(const char* path, int short_side, int* out_w, int* out_h) {
  Decoder d;
  int rc = open_decoder(path, &d);
  if (rc != 0) return rc;
  compute_out_size(d.width, d.height, short_side, out_w, out_h);
  return 0;
}

// Decode the given sorted-or-not frame indices into out (n * out_h * out_w * 3,
// RGB24, row-major). Duplicate indices allowed. Indices beyond the stream get
// the last decoded frame (lax). Returns number of filled frames, or <0 error.
int oatx_decode_indices(const char* path, const int64_t* indices, int n,
                        int short_side, uint8_t* out, int out_w, int out_h) {
  if (n <= 0) return 0;
  Decoder d;
  int rc = open_decoder(path, &d);
  if (rc != 0) return rc;
  return decode_indices_core(&d, indices, n, short_side, out, out_w, out_h);
}

// ---------------------------------------------------------------- test writer

// Write a synthetic test clip: n frames of a moving gradient with the frame
// index stamped into the top-left 8x8 block brightness. For fixtures only.
// `codec_name` picks the encoder ("mjpeg" historical default; "mpeg4" /
// "libx264" produce INTER-coded streams exercising the keyframe-seek decode
// path); `gop` sets the keyframe interval for inter codecs (<=0: encoder
// default). Container comes from the path's extension (.avi/.mp4/...).
int oatx_write_test_video_ex(const char* path, int width, int height, int n,
                             int fps, unsigned seed, const char* codec_name,
                             int gop) {
  // seed 0 keeps the historical pattern; nonzero seeds vary spatial
  // frequency, phase and chroma so multi-video fixtures are visually distinct
  // (rank-parity and learnability tests need SEPARABLE content). Chroma sits
  // on a golden-angle ring of radius 90 around (128,128): consecutive seeds
  // land maximally far apart, and the flat frame-wide chroma survives any
  // crop/flip/frame-sample — a small model can identify the clip from any
  // augmented view.
  unsigned s = seed * 2654435761u;
  const int phase = (int)(s & 0xFFu);
  const int fx = 1 + (int)((s >> 8) & 3u);
  const int fy = 1 + (int)((s >> 10) & 3u);
  int cu = 128, cv = 128;
  if (seed != 0) {
    const double ang = (double)seed * 2.39996322972865332;  // golden angle
    cu = 128 + (int)std::lround(90.0 * std::cos(ang));
    cv = 128 + (int)std::lround(90.0 * std::sin(ang));
  } else {
    cu = 128 + (int)((s >> 12) & 0x3Fu) - 32;  // == 96 at seed 0 (historical)
    cv = 128 + (int)((s >> 18) & 0x3Fu) - 32;
  }
  const bool mjpeg = !codec_name || std::strcmp(codec_name, "mjpeg") == 0;
  const AVCodec* enc = mjpeg ? avcodec_find_encoder(AV_CODEC_ID_MJPEG)
                             : avcodec_find_encoder_by_name(codec_name);
  if (!enc) return -1;
  AVFormatContext* fmt = nullptr;
  if (avformat_alloc_output_context2(&fmt, nullptr, mjpeg ? "avi" : nullptr,
                                     path) < 0) {
    return -2;
  }
  AVStream* st = avformat_new_stream(fmt, enc);
  AVCodecContext* c = avcodec_alloc_context3(enc);
  c->width = width;
  c->height = height;
  c->time_base = {1, fps};
  c->framerate = {fps, 1};
  if (mjpeg) {
    c->pix_fmt = AV_PIX_FMT_YUVJ420P;
    c->flags |= AV_CODEC_FLAG_QSCALE;
    c->global_quality = FF_QP2LAMBDA * 2;
  } else {
    c->pix_fmt = AV_PIX_FMT_YUV420P;
    if (gop > 0) c->gop_size = gop;
    c->bit_rate = (int64_t)width * height * fps / 2;  // generous for fixtures
    av_opt_set(c->priv_data, "preset", "ultrafast", 0);  // no-op off x264
    if (std::strcmp(codec_name, "mpeg4") == 0 ||
        std::strcmp(codec_name, "mpeg2video") == 0) {
      c->max_b_frames = 2;  // exercise presentation-order reordering in tests
    }
  }
  if (fmt->oformat->flags & AVFMT_GLOBALHEADER) {
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  }
  if (avcodec_open2(c, enc, nullptr) < 0) return -3;
  avcodec_parameters_from_context(st->codecpar, c);
  st->time_base = c->time_base;
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&fmt->pb, path, AVIO_FLAG_WRITE) < 0) return -4;
  }
  if (avformat_write_header(fmt, nullptr) < 0) return -5;

  AVFrame* frame = av_frame_alloc();
  frame->format = c->pix_fmt;
  frame->width = width;
  frame->height = height;
  av_frame_get_buffer(frame, 0);
  AVPacket* pkt = av_packet_alloc();

  // nonzero seeds also get a flat per-seed luma band over the middle third —
  // a second independent signature dimension (chroma ring neighbors stay
  // separable); like the chroma it is constant across frames and crops
  const int band_luma = (int)(20u + ((s >> 24) * 131u) % 216u);
  for (int i = 0; i < n; i++) {
    av_frame_make_writable(frame);
    for (int y = 0; y < height; y++)
      for (int x = 0; x < width; x++)
        frame->data[0][y * frame->linesize[0] + x] =
            (seed != 0 && y >= height / 3 && y < 2 * height / 3)
                ? (uint8_t)band_luma
                : (uint8_t)((x * fx + y * fy + i * 16 + phase) & 0xFF);
    // stamp frame index into an 8x8 flat block (survives JPEG)
    for (int y = 0; y < 8 && y < height; y++)
      for (int x = 0; x < 8 && x < width; x++)
        frame->data[0][y * frame->linesize[0] + x] =
            (uint8_t)std::min(255, 16 + i * 8);
    for (int y = 0; y < height / 2; y++)
      for (int x = 0; x < width / 2; x++) {
        // keep the frame-index stamp block chroma-NEUTRAL under the seeded
        // ring chroma: radius-90 chroma can clip an RGB channel to 0/255 and
        // destroy the stamp's monotonicity in pixel space (the index-
        // alignment tests read it). seed 0 keeps the historical flat chroma.
        const bool stamp = seed != 0 && y < 4 && x < 4;
        frame->data[1][y * frame->linesize[1] + x] = (uint8_t)(stamp ? 128 : cu);
        frame->data[2][y * frame->linesize[2] + x] = (uint8_t)(stamp ? 128 : cv);
      }
    frame->pts = i;
    frame->quality = c->global_quality;
    if (avcodec_send_frame(c, frame) == 0) {
      while (avcodec_receive_packet(c, pkt) == 0) {
        // one frame per packet in c->time_base; without an explicit duration
        // a 1-packet mp4 gets edit-list duration 0 and the demuxer DISCARDs
        // its only sample (decoders then output nothing at all)
        pkt->duration = 1;
        av_packet_rescale_ts(pkt, c->time_base, st->time_base);
        pkt->stream_index = st->index;
        av_interleaved_write_frame(fmt, pkt);
        av_packet_unref(pkt);
      }
    }
  }
  avcodec_send_frame(c, nullptr);
  while (avcodec_receive_packet(c, pkt) == 0) {
    pkt->duration = 1;
    av_packet_rescale_ts(pkt, c->time_base, st->time_base);
    pkt->stream_index = st->index;
    av_interleaved_write_frame(fmt, pkt);
    av_packet_unref(pkt);
  }
  av_write_trailer(fmt);
  av_packet_free(&pkt);
  av_frame_free(&frame);
  avcodec_free_context(&c);
  if (!(fmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&fmt->pb);
  avformat_free_context(fmt);
  return 0;
}

// Historical MJPEG/AVI writer (v0.1 ABI).
int oatx_write_test_video(const char* path, int width, int height, int n,
                          int fps, unsigned seed) {
  return oatx_write_test_video_ex(path, width, height, n, fps, seed, "mjpeg", 0);
}

// One-pass re-encode helper for archival sources whose GOP length dominates
// per-clip decode cost (keyframe-seek stepping decodes from the nearest
// preceding keyframe: a gop-250 x264 clip costs ~3 cores/chip vs ~1 at
// gop<=60 — PERF.md "Host decode plane v2"). Decodes every frame of
// in_path's best video stream and re-encodes at the same size/rate with
// `codec_name` (+gop), dropping non-video streams. quality: JPEG qscale for
// mjpeg (2 = near-lossless), crf for libx264 (18 default). Returns frames
// written (>=0) or a negative error code.
int64_t oatx_transcode(const char* in_path, const char* out_path,
                       const char* codec_name, int gop, int quality) {
  Decoder d;
  if (int rc = open_decoder(in_path, &d)) return -100 + rc;
  const bool mjpeg = !codec_name || !std::strcmp(codec_name, "mjpeg");
  const AVCodec* enc = mjpeg ? avcodec_find_encoder(AV_CODEC_ID_MJPEG)
                             : avcodec_find_encoder_by_name(codec_name);
  if (!enc) return -1;
  AVFormatContext* ofmt = nullptr;
  AVCodecContext* c = nullptr;
  // error-path cleanup: frees the encoder/muxer state the early returns
  // below would otherwise leak in long-lived remux workers (the input-side
  // Decoder is RAII and cleans itself)
  auto bail = [&](int64_t rc) {
    if (c) avcodec_free_context(&c);
    if (ofmt) {
      if (ofmt->pb && !(ofmt->oformat->flags & AVFMT_NOFILE)) {
        avio_closep(&ofmt->pb);
      }
      avformat_free_context(ofmt);
    }
    return rc;
  };
  if (avformat_alloc_output_context2(&ofmt, nullptr, mjpeg ? "avi" : nullptr,
                                     out_path) < 0) {
    return bail(-2);
  }
  AVStream* st = avformat_new_stream(ofmt, enc);
  c = avcodec_alloc_context3(enc);
  if (!st || !c) return bail(-3);
  AVRational fr = d.frame_rate.num ? d.frame_rate : AVRational{25, 1};
  c->width = d.width;
  c->height = d.height;
  c->time_base = av_inv_q(fr);
  c->framerate = fr;
  if (mjpeg) {
    c->pix_fmt = AV_PIX_FMT_YUVJ420P;
    c->flags |= AV_CODEC_FLAG_QSCALE;
    c->global_quality = FF_QP2LAMBDA * (quality > 0 ? quality : 2);
  } else {
    c->pix_fmt = AV_PIX_FMT_YUV420P;
    if (gop > 0) c->gop_size = gop;
    if (!std::strcmp(codec_name, "libx264")) {
      av_opt_set(c->priv_data, "preset", "veryfast", 0);
      char crf[16];
      std::snprintf(crf, sizeof crf, "%d", quality > 0 ? quality : 18);
      av_opt_set(c->priv_data, "crf", crf, 0);
    } else {
      c->bit_rate = (int64_t)d.width * d.height *
                    (fr.den ? fr.num / fr.den : 25) / 2;
    }
  }
  if (ofmt->oformat->flags & AVFMT_GLOBALHEADER) {
    c->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
  }
  if (avcodec_open2(c, enc, nullptr) < 0) return bail(-4);
  avcodec_parameters_from_context(st->codecpar, c);
  st->time_base = c->time_base;
  if (!(ofmt->oformat->flags & AVFMT_NOFILE)) {
    if (avio_open(&ofmt->pb, out_path, AVIO_FLAG_WRITE) < 0) return bail(-5);
  }
  if (avformat_write_header(ofmt, nullptr) < 0) return bail(-6);

  SwsContext* sws = nullptr;
  AVFrame* dec_frame = av_frame_alloc();
  AVFrame* enc_frame = av_frame_alloc();
  AVPacket* in_pkt = av_packet_alloc();
  AVPacket* out_pkt = av_packet_alloc();
  // allocation failure must route through bail() like every other -N path,
  // not null-deref on enc_frame->format below
  auto free_frames = [&]() {
    if (in_pkt) av_packet_free(&in_pkt);
    if (out_pkt) av_packet_free(&out_pkt);
    if (dec_frame) av_frame_free(&dec_frame);
    if (enc_frame) av_frame_free(&enc_frame);
  };
  if (!dec_frame || !enc_frame || !in_pkt || !out_pkt) {
    free_frames();
    return bail(-8);
  }
  enc_frame->format = c->pix_fmt;
  enc_frame->width = c->width;
  enc_frame->height = c->height;
  if (av_frame_get_buffer(enc_frame, 0) < 0) {
    free_frames();
    return bail(-8);
  }
  int64_t written = 0;
  bool fail = false;

  auto drain_encoder = [&]() {
    while (avcodec_receive_packet(c, out_pkt) == 0) {
      if (out_pkt->duration <= 0) out_pkt->duration = 1;
      av_packet_rescale_ts(out_pkt, c->time_base, st->time_base);
      out_pkt->stream_index = st->index;
      if (av_interleaved_write_frame(ofmt, out_pkt) < 0) fail = true;
      av_packet_unref(out_pkt);
      written++;
    }
  };
  int64_t in_count = 0;
  auto encode_one = [&](AVFrame* src) {
    av_frame_make_writable(enc_frame);
    if (!sws) {
      sws = sws_getContext(src->width, src->height, (AVPixelFormat)src->format,
                           c->width, c->height, c->pix_fmt, SWS_BILINEAR,
                           nullptr, nullptr, nullptr);
    }
    if (!sws) { fail = true; return; }
    sws_scale(sws, src->data, src->linesize, 0, src->height, enc_frame->data,
              enc_frame->linesize);
    // CFR output: pts = running input frame counter (presentation order out
    // of the decoder; the encoder handles its own B-frame reordering)
    enc_frame->pts = in_count++;
    enc_frame->quality = c->global_quality;
    // EAGAIN = encoder buffer full: drain pending packets and retry once;
    // any other failure must flag the whole transcode (a silently dropped
    // frame would shift frame indices for every epoch trained on the output)
    int rc = avcodec_send_frame(c, enc_frame);
    if (rc == AVERROR(EAGAIN)) {
      drain_encoder();
      rc = avcodec_send_frame(c, enc_frame);
    }
    if (rc == 0) drain_encoder(); else fail = true;
  };

  while (av_read_frame(d.fmt, in_pkt) >= 0 && !fail) {
    if (in_pkt->stream_index == d.stream_index) {
      if (avcodec_send_packet(d.codec, in_pkt) == 0) {
        while (avcodec_receive_frame(d.codec, dec_frame) == 0 && !fail) {
          encode_one(dec_frame);
        }
      }
    }
    av_packet_unref(in_pkt);
  }
  // flush decoder then encoder
  avcodec_send_packet(d.codec, nullptr);
  while (avcodec_receive_frame(d.codec, dec_frame) == 0 && !fail) {
    encode_one(dec_frame);
  }
  avcodec_send_frame(c, nullptr);
  drain_encoder();
  av_write_trailer(ofmt);

  if (sws) sws_freeContext(sws);
  av_packet_free(&in_pkt);
  av_packet_free(&out_pkt);
  av_frame_free(&dec_frame);
  av_frame_free(&enc_frame);
  avcodec_free_context(&c);
  if (!(ofmt->oformat->flags & AVFMT_NOFILE)) avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return fail ? -7 : written;
}

const char* oatx_version() { return "oatx_decode 0.2 (" LIBAVCODEC_IDENT ")"; }

}  // extern "C"
