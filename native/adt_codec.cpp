// Native any-container audio decode via the system FFmpeg libraries
// (libavformat/libavcodec, linked — no ffmpeg binary, no subprocess).
//
// Closes the last decode-parity gap with the reference's PyAV ingest
// (reference utils.py:179-198 decodes any container PyAV supports): the
// ctypes/pure-Python codec stack (io/codec.py, io/flac.py) covers the
// reference corpus natively (wav/mp3/webm-opus/ogg/flac); this TU covers
// the long tail — m4a/aac, mp4, wma, aiff — through the same demux+decode
// libraries PyAV wraps, compiled against the system headers so no struct
// layout is guessed at runtime.
//
// C ABI (ctypes-consumed by audio_denoising_tpu/io/avdec.py):
//   adt_av_decode(path, &buf, &n, &ch, &rate, err, errlen) -> 0 on success,
//     buf = malloc'd PLANAR float32 (ch rows of n samples); free with
//     adt_av_free. Any audio stream llavformat can demux and llavcodec can
//     decode; all sample formats normalized to float32.
//   adt_av_encode_m4a(path, pcm, n, ch, rate, err, errlen): TEST-FIXTURE
//     encoder (native FFmpeg 'aac' coder in an .m4a/.mp4 container) so the
//     round-trip tests need no binary assets, mirroring
//     tests/helpers_flacenc.py / helpers_oggenc.py.

extern "C" {
#include <libavcodec/avcodec.h>
#include <libavformat/avformat.h>
#include <libavutil/channel_layout.h>
#include <libavutil/opt.h>
#include <libavutil/samplefmt.h>
}

#include <cstdint>
#include <cstring>
#include <string>
#include <vector>

namespace {

void set_err(char *err, int errlen, const std::string &msg, int averr = 0) {
  if (!err || errlen <= 0) return;
  std::string full = msg;
  if (averr != 0) {
    char buf[AV_ERROR_MAX_STRING_SIZE] = {0};
    av_strerror(averr, buf, sizeof(buf));
    full += ": ";
    full += buf;
  }
  std::snprintf(err, errlen, "%s", full.c_str());
}

// Append one decoded frame (any sample format) to per-channel vectors.
bool append_frame(const AVFrame *fr, int channels,
                  std::vector<std::vector<float>> &out) {
  const int n = fr->nb_samples;
  const auto fmt = static_cast<AVSampleFormat>(fr->format);
  const bool planar = av_sample_fmt_is_planar(fmt) != 0;
  const AVSampleFormat base = av_get_packed_sample_fmt(fmt);
  for (int c = 0; c < channels; ++c) {
    std::vector<float> &dst = out[c];
    const size_t off = dst.size();
    dst.resize(off + n);
    const uint8_t *data = planar ? fr->extended_data[c]
                                 : fr->extended_data[0];
    const int stride = planar ? 1 : channels;
    const int first = planar ? 0 : c;
    switch (base) {
      case AV_SAMPLE_FMT_U8: {
        const uint8_t *s = data;
        for (int i = 0; i < n; ++i)
          dst[off + i] = (s[first + i * stride] - 128) / 128.0f;
        break;
      }
      case AV_SAMPLE_FMT_S16: {
        const int16_t *s = reinterpret_cast<const int16_t *>(data);
        for (int i = 0; i < n; ++i)
          dst[off + i] = s[first + i * stride] / 32768.0f;
        break;
      }
      case AV_SAMPLE_FMT_S32: {
        const int32_t *s = reinterpret_cast<const int32_t *>(data);
        for (int i = 0; i < n; ++i)
          dst[off + i] = s[first + i * stride] / 2147483648.0f;
        break;
      }
      case AV_SAMPLE_FMT_S64: {
        const int64_t *s = reinterpret_cast<const int64_t *>(data);
        for (int i = 0; i < n; ++i)
          dst[off + i] =
              static_cast<float>(s[first + i * stride] / 9.223372036854776e18);
        break;
      }
      case AV_SAMPLE_FMT_FLT: {
        const float *s = reinterpret_cast<const float *>(data);
        for (int i = 0; i < n; ++i) dst[off + i] = s[first + i * stride];
        break;
      }
      case AV_SAMPLE_FMT_DBL: {
        const double *s = reinterpret_cast<const double *>(data);
        for (int i = 0; i < n; ++i)
          dst[off + i] = static_cast<float>(s[first + i * stride]);
        break;
      }
      default:
        return false;
    }
  }
  return true;
}

}  // namespace

extern "C" {

void adt_av_free(float *p) { free(p); }

int adt_av_decode(const char *path, float **out, int64_t *n_samples,
                  int *channels, int *sample_rate, char *err, int errlen) {
  *out = nullptr;
  *n_samples = 0;
  *channels = 0;
  *sample_rate = 0;

  AVFormatContext *fmt = nullptr;
  int rc = avformat_open_input(&fmt, path, nullptr, nullptr);
  if (rc < 0) {
    set_err(err, errlen, "avformat_open_input failed", rc);
    return 1;
  }
  AVCodecContext *cc = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *fr = nullptr;
  int ret = 1;
  std::vector<std::vector<float>> chans;
  do {
    rc = avformat_find_stream_info(fmt, nullptr);
    if (rc < 0) {
      set_err(err, errlen, "avformat_find_stream_info failed", rc);
      break;
    }
    const AVCodec *dec = nullptr;
    int sidx = av_find_best_stream(fmt, AVMEDIA_TYPE_AUDIO, -1, -1, &dec, 0);
    if (sidx < 0 || !dec) {
      set_err(err, errlen, "no decodable audio stream", sidx);
      break;
    }
    AVStream *st = fmt->streams[sidx];
    cc = avcodec_alloc_context3(dec);
    if (!cc || avcodec_parameters_to_context(cc, st->codecpar) < 0) {
      set_err(err, errlen, "codec context setup failed");
      break;
    }
    rc = avcodec_open2(cc, dec, nullptr);
    if (rc < 0) {
      set_err(err, errlen, "avcodec_open2 failed", rc);
      break;
    }
    const int ch = cc->ch_layout.nb_channels;
    if (ch <= 0 || ch > 64) {
      set_err(err, errlen, "bad channel count");
      break;
    }
    chans.assign(ch, {});
    pkt = av_packet_alloc();
    fr = av_frame_alloc();
    bool fmt_ok = true;
    // standard demux->decode loop with end-of-stream decoder flush
    // (send_packet(NULL) drains codecs with delay, e.g. AAC)
    bool eof = false;
    while (!eof && fmt_ok) {
      rc = av_read_frame(fmt, pkt);
      if (rc == AVERROR_EOF) {
        eof = true;
      } else if (rc < 0) {
        set_err(err, errlen, "av_read_frame failed", rc);
        fmt_ok = false;
        break;
      }
      if (!eof && pkt->stream_index != sidx) {
        av_packet_unref(pkt);
        continue;
      }
      rc = avcodec_send_packet(cc, eof ? nullptr : pkt);
      if (!eof) av_packet_unref(pkt);
      if (rc < 0 && rc != AVERROR(EAGAIN) && rc != AVERROR_EOF) {
        continue;  // corrupt packet: skip, keep decoding (codec resyncs)
      }
      while ((rc = avcodec_receive_frame(cc, fr)) >= 0) {
        if (!append_frame(fr, ch, chans)) {
          set_err(err, errlen, "unsupported sample format");
          fmt_ok = false;
        }
        av_frame_unref(fr);
        if (!fmt_ok) break;
      }
    }
    if (!fmt_ok) break;
    const int64_t n = chans.empty() ? 0
                      : static_cast<int64_t>(chans[0].size());
    float *buf = static_cast<float *>(malloc(sizeof(float) * ch *
                                             (n > 0 ? n : 1)));
    if (!buf) {
      set_err(err, errlen, "out of memory");
      break;
    }
    for (int c = 0; c < ch; ++c)
      std::memcpy(buf + c * n, chans[c].data(), sizeof(float) * n);
    *out = buf;
    *n_samples = n;
    *channels = ch;
    *sample_rate = cc->sample_rate;
    ret = 0;
  } while (false);

  if (fr) av_frame_free(&fr);
  if (pkt) av_packet_free(&pkt);
  if (cc) avcodec_free_context(&cc);
  avformat_close_input(&fmt);
  return ret;
}

// Test-fixture encoder: planar float32 (ch, n) -> .m4a (MP4 container,
// FFmpeg native 'aac' coder). Not a product surface — exists so the
// decode round-trip tests can synthesize their own fixtures.
int adt_av_encode_m4a(const char *path, const float *pcm, int64_t n_samples,
                      int channels, int sample_rate, char *err, int errlen) {
  AVFormatContext *ofmt = nullptr;
  int rc = avformat_alloc_output_context2(&ofmt, nullptr, nullptr, path);
  if (rc < 0 || !ofmt) {
    set_err(err, errlen, "output context failed", rc);
    return 1;
  }
  AVCodecContext *cc = nullptr;
  AVPacket *pkt = nullptr;
  AVFrame *fr = nullptr;
  int ret = 1;
  bool header_written = false;
  do {
    const AVCodec *enc = avcodec_find_encoder(AV_CODEC_ID_AAC);
    if (!enc) {
      set_err(err, errlen, "no AAC encoder in libavcodec");
      break;
    }
    AVStream *st = avformat_new_stream(ofmt, nullptr);
    cc = avcodec_alloc_context3(enc);
    if (!st || !cc) {
      set_err(err, errlen, "stream/context alloc failed");
      break;
    }
    cc->sample_rate = sample_rate;
    cc->sample_fmt = AV_SAMPLE_FMT_FLTP;
    av_channel_layout_default(&cc->ch_layout, channels);
    cc->time_base = AVRational{1, sample_rate};
    cc->bit_rate = 128000;
    if (ofmt->oformat->flags & AVFMT_GLOBALHEADER)
      cc->flags |= AV_CODEC_FLAG_GLOBAL_HEADER;
    rc = avcodec_open2(cc, enc, nullptr);
    if (rc < 0) {
      set_err(err, errlen, "avcodec_open2(aac) failed", rc);
      break;
    }
    avcodec_parameters_from_context(st->codecpar, cc);
    st->time_base = cc->time_base;
    if (!(ofmt->oformat->flags & AVFMT_NOFILE)) {
      rc = avio_open(&ofmt->pb, path, AVIO_FLAG_WRITE);
      if (rc < 0) {
        set_err(err, errlen, "avio_open failed", rc);
        break;
      }
    }
    rc = avformat_write_header(ofmt, nullptr);
    if (rc < 0) {
      set_err(err, errlen, "write_header failed", rc);
      break;
    }
    header_written = true;
    pkt = av_packet_alloc();
    fr = av_frame_alloc();
    const int fsz = cc->frame_size > 0 ? cc->frame_size : 1024;
    int64_t pos = 0;
    bool fail = false;
    auto drain = [&](bool flush) -> bool {
      int r2 = avcodec_send_frame(cc, flush ? nullptr : fr);
      if (r2 < 0 && r2 != AVERROR(EAGAIN)) return false;
      while ((r2 = avcodec_receive_packet(cc, pkt)) >= 0) {
        av_packet_rescale_ts(pkt, cc->time_base, st->time_base);
        pkt->stream_index = st->index;
        if (av_interleaved_write_frame(ofmt, pkt) < 0) return false;
      }
      return r2 == AVERROR(EAGAIN) || r2 == AVERROR_EOF;
    };
    while (pos < n_samples && !fail) {
      const int n = static_cast<int>(std::min<int64_t>(fsz, n_samples - pos));
      fr->nb_samples = n;
      fr->format = AV_SAMPLE_FMT_FLTP;
      av_channel_layout_copy(&fr->ch_layout, &cc->ch_layout);
      fr->sample_rate = sample_rate;
      if (av_frame_get_buffer(fr, 0) < 0) { fail = true; break; }
      for (int c = 0; c < channels; ++c)
        std::memcpy(fr->extended_data[c], pcm + c * n_samples + pos,
                    sizeof(float) * n);
      fr->pts = pos;
      pos += n;
      if (!drain(false)) { fail = true; break; }
      av_frame_unref(fr);
    }
    if (fail || !drain(true)) {
      set_err(err, errlen, "encode failed");
      break;
    }
    ret = 0;
  } while (false);

  if (header_written) av_write_trailer(ofmt);
  if (fr) av_frame_free(&fr);
  if (pkt) av_packet_free(&pkt);
  if (cc) avcodec_free_context(&cc);
  if (ofmt && !(ofmt->oformat->flags & AVFMT_NOFILE) && ofmt->pb)
    avio_closep(&ofmt->pb);
  avformat_free_context(ofmt);
  return ret;
}

}  // extern "C"
