// FFmpeg-based video decoder for the serving data path.
//
// Replaces the OpenCV loop (io/video.py load_video, itself mirroring
// reference videoprism/video_utils.py:20-94).  Sampling is seek-assisted
// sequential: when the next wanted (sorted, uniform-linspace) index is
// far ahead, seek to the preceding keyframe and decode forward to the
// EXACT frame (indices recovered from best-effort PTS, so no
// keyframe-snapping inaccuracy); nearby indices just decode forward.
// Only kept frames are converted — one sws_scale (bilinear resize +
// RGB24) each, center-cropped straight into the caller's [n, S, S, 3]
// uint8 buffer.  Streams without usable timestamps fall back to pure
// sequential decode with frame counting.
//
// C API (ctypes-bound in native/__init__.py):
//   vp_decoder_open(path, err, errlen)        -> handle | NULL
//   vp_decoder_info(h, &frames, &w, &h, &fps) -> 0 | -1
//   vp_decoder_sample(h, indices, n, out, target_size, resize_mode)
//       resize_mode: 0 = shortest-side resize + center crop, 1 = resize
//   vp_decoder_sample_crops(h, indices, n, out, target_size, fracs, m)
//       multi-crop variant for multi-view evaluation: one decode +
//       sws_scale per distinct frame, then m crops along the longer
//       side at fractional offsets fracs[0..m) in [0, 1] (0.5 == the
//       center crop) — out is [n, m, S, S, 3]
//   vp_decoder_close(h)

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/imgutils.h>
#include <libswscale/swscale.h>
}

#include <algorithm>
#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

struct Decoder {
  AVFormatContext* fmt = nullptr;
  AVCodecContext* codec = nullptr;
  int stream_index = -1;
  int64_t num_frames = 0;
  double fps = 0.0;
  std::string error;
};

void set_err(char* err, int errlen, const std::string& msg) {
  if (err && errlen > 0) {
    std::snprintf(err, errlen, "%s", msg.c_str());
  }
}

int64_t count_frames(Decoder* d) {
  AVStream* st = d->fmt->streams[d->stream_index];
  if (st->nb_frames > 0) return st->nb_frames;
  // Container doesn't store a frame count: estimate from duration x fps.
  double dur = 0.0;
  if (st->duration > 0) {
    dur = st->duration * av_q2d(st->time_base);
  } else if (d->fmt->duration > 0) {
    dur = d->fmt->duration / static_cast<double>(AV_TIME_BASE);
  }
  if (dur > 0.0 && d->fps > 0.0) {
    return static_cast<int64_t>(dur * d->fps + 0.5);
  }
  return 0;
}

}  // namespace

extern "C" {

void* vp_decoder_open(const char* path, char* err, int errlen) {
  auto* d = new Decoder();
  if (avformat_open_input(&d->fmt, path, nullptr, nullptr) < 0) {
    set_err(err, errlen, std::string("could not open ") + path);
    delete d;
    return nullptr;
  }
  if (avformat_find_stream_info(d->fmt, nullptr) < 0) {
    set_err(err, errlen, "could not read stream info");
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  const AVCodec* codec = nullptr;
  d->stream_index =
      av_find_best_stream(d->fmt, AVMEDIA_TYPE_VIDEO, -1, -1, &codec, 0);
  if (d->stream_index < 0 || codec == nullptr) {
    set_err(err, errlen, "no decodable video stream");
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  AVStream* st = d->fmt->streams[d->stream_index];
  d->codec = avcodec_alloc_context3(codec);
  avcodec_parameters_to_context(d->codec, st->codecpar);
  d->codec->thread_count = 0;  // auto
  d->codec->thread_type = FF_THREAD_FRAME | FF_THREAD_SLICE;
  if (avcodec_open2(d->codec, codec, nullptr) < 0) {
    set_err(err, errlen, "could not open codec");
    avcodec_free_context(&d->codec);
    avformat_close_input(&d->fmt);
    delete d;
    return nullptr;
  }
  AVRational fr = av_guess_frame_rate(d->fmt, st, nullptr);
  d->fps = fr.num > 0 && fr.den > 0 ? av_q2d(fr) : 0.0;
  d->num_frames = count_frames(d);
  return d;
}

int vp_decoder_info(void* handle, int64_t* num_frames, int* width,
                    int* height, double* fps) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d || !d->codec) return -1;
  if (num_frames) *num_frames = d->num_frames;
  if (width) *width = d->codec->width;
  if (height) *height = d->codec->height;
  if (fps) *fps = d->fps;
  return 0;
}

namespace {

// Decodes sequentially, converting only frames whose index is in
// `indices` (must be sorted ascending, may contain duplicates).  Writes
// uint8 RGB [n, num_crops, target, target, 3] into `out` — one
// sws_scale per distinct frame, then `num_crops` crops along the longer
// side at fractional offsets `fracs` (truncating arithmetic, so 0.5
// reproduces the center crop's (L - target) / 2 exactly).  Returns the
// number of frames written (== n on success; fewer on early stream end).
int sample_impl(Decoder* d, const int64_t* indices, int n, uint8_t* out,
                int target, int resize_mode, const double* fracs,
                int num_crops) {
  if (!d || !d->codec || n <= 0 || num_crops <= 0) return 0;

  const int src_w = d->codec->width;
  const int src_h = d->codec->height;
  // Shortest-side resize (same integer arithmetic as io/video.py
  // _center_crop_resize / reference video_utils.py:97-127).
  int new_w, new_h;
  if (resize_mode == 1) {
    new_w = new_h = target;
  } else if (src_h < src_w) {
    new_h = target;
    new_w = static_cast<int>(src_w * (static_cast<double>(target) / src_h));
  } else {
    new_w = target;
    new_h = static_cast<int>(src_h * (static_cast<double>(target) / src_w));
  }
  std::vector<int> crop_xs(num_crops), crop_ys(num_crops);
  for (int c = 0; c < num_crops; ++c) {
    crop_xs[c] = static_cast<int>((new_w - target) * fracs[c]);
    crop_ys[c] = static_cast<int>((new_h - target) * fracs[c]);
  }

  SwsContext* sws = sws_getContext(
      src_w, src_h, d->codec->pix_fmt, new_w, new_h, AV_PIX_FMT_RGB24,
      SWS_BILINEAR, nullptr, nullptr, nullptr);
  if (!sws) return 0;

  std::vector<uint8_t> rgb(static_cast<size_t>(new_w) * new_h * 3);
  uint8_t* rgb_data[1] = {rgb.data()};
  int rgb_stride[1] = {new_w * 3};

  AVStream* st = d->fmt->streams[d->stream_index];
  const double tb = av_q2d(st->time_base);
  const int64_t start_ts =
      st->start_time == AV_NOPTS_VALUE ? 0 : st->start_time;
  const bool can_index = d->fps > 0.0 && tb > 0.0;
  // Seeking pays a keyframe->target re-decode (typical GOP 12-30 frames);
  // decoding forward through a smaller gap beats a container seek + codec
  // flush.
  const int64_t kSeekGap = 16;

  AVPacket* pkt = av_packet_alloc();
  AVFrame* frame = av_frame_alloc();
  int64_t frame_idx = 0;   // index of the NEXT frame the codec emits
  int64_t last_seek_want = -1;  // guards against re-seeking in place
  bool pending_sync = false;    // post-seek, before a PTS-bearing frame
  int written = 0;
  bool draining = false;

  const size_t crop_bytes = static_cast<size_t>(target) * target * 3;
  auto keep = [&](AVFrame* f, int64_t idx) {
    // Convert once per *distinct* frame, then copy for duplicates.
    bool converted = false;
    while (written < n && indices[written] == idx) {
      if (!converted) {
        sws_scale(sws, f->data, f->linesize, 0, src_h, rgb_data,
                  rgb_stride);
        converted = true;
      }
      uint8_t* frame_dst =
          out + static_cast<size_t>(written) * num_crops * crop_bytes;
      for (int c = 0; c < num_crops; ++c) {
        uint8_t* dst = frame_dst + static_cast<size_t>(c) * crop_bytes;
        for (int row = 0; row < target; ++row) {
          std::memcpy(
              dst + static_cast<size_t>(row) * target * 3,
              rgb.data() + (static_cast<size_t>(crop_ys[c] + row) * new_w +
                            crop_xs[c]) * 3,
              static_cast<size_t>(target) * 3);
        }
      }
      ++written;
    }
  };

  auto maybe_seek = [&]() {
    if (!can_index || written >= n) return;
    const int64_t want = indices[written];
    if (want >= frame_idx && want - frame_idx < kSeekGap) return;
    // One seek attempt per target: a backward seek may legitimately land
    // a whole GOP (>= kSeekGap) before `want` — decoding forward from
    // there must not trigger another identical seek (infinite loop on
    // long-GOP H.264).
    if (want == last_seek_want) return;
    const int64_t ts =
        start_ts + static_cast<int64_t>(want / d->fps / tb);
    if (av_seek_frame(d->fmt, d->stream_index, ts,
                      AVSEEK_FLAG_BACKWARD) >= 0) {
      avcodec_flush_buffers(d->codec);
      draining = false;
      last_seek_want = want;
      pending_sync = true;
      // frame_idx is re-derived from the first post-seek PTS below; mark
      // unknown-but-behind so we don't immediately re-seek.
      frame_idx = want;  // provisional; corrected on next decoded frame
    }
  };

  maybe_seek();
  while (written < n) {
    if (!draining) {
      int r = av_read_frame(d->fmt, pkt);
      if (r < 0) {
        avcodec_send_packet(d->codec, nullptr);  // flush
        draining = true;
      } else if (pkt->stream_index == d->stream_index) {
        avcodec_send_packet(d->codec, pkt);
        av_packet_unref(pkt);
      } else {
        av_packet_unref(pkt);
        continue;
      }
    }
    int r;
    while ((r = avcodec_receive_frame(d->codec, frame)) == 0 &&
           written < n) {
      int64_t idx = frame_idx;
      const bool has_ts =
          frame->best_effort_timestamp != AV_NOPTS_VALUE;
      if (can_index && has_ts) {
        // Exact index from the timestamp (robust across seeks).
        idx = static_cast<int64_t>(
            (frame->best_effort_timestamp - start_ts) * tb * d->fps + 0.5);
        pending_sync = false;
      }
      // Post-seek frames without a timestamp have an UNKNOWN index (the
      // provisional frame_idx is just the seek target): never write them
      // as if they were the requested frame.
      if (!pending_sync) keep(frame, idx);
      frame_idx = idx + 1;
      av_frame_unref(frame);
      maybe_seek();
    }
    if (draining && r != 0) break;  // fully drained
  }

  av_frame_free(&frame);
  av_packet_free(&pkt);
  sws_freeContext(sws);
  return written;
}

}  // namespace

int vp_decoder_sample(void* handle, const int64_t* indices, int n,
                      uint8_t* out, int target, int resize_mode) {
  const double center = 0.5;
  return sample_impl(static_cast<Decoder*>(handle), indices, n, out, target,
                     resize_mode, &center, 1);
}

int vp_decoder_sample_crops(void* handle, const int64_t* indices, int n,
                            uint8_t* out, int target, const double* fracs,
                            int num_crops) {
  return sample_impl(static_cast<Decoder*>(handle), indices, n, out, target,
                     /*resize_mode=*/0, fracs, num_crops);
}

void vp_decoder_close(void* handle) {
  auto* d = static_cast<Decoder*>(handle);
  if (!d) return;
  if (d->codec) avcodec_free_context(&d->codec);
  if (d->fmt) avformat_close_input(&d->fmt);
  delete d;
}

}  // extern "C"
