// Native client for the scoring service (serve.py / ops/score_server.py).
//
// Proves the wire protocol's language-independence claim and gives robot
// hosts a zero-dependency binary: the protocol is 4-byte big-endian length
// frames, each a JSON header line plus an optional raw little-endian
// float32 payload (ops/score_server.py module docstring).  The reference's
// robot-side consumers were rospy nodes scoring in-process
// (test_file/realtime_tester.py:260-309); this binary lets any process on
// the robot network score windows against the resident TPU server.
//
// Usage:
//   score_client HOST PORT info
//   score_client HOST PORT score_base|score_sap|score_nap N D
//       reads N*D little-endian float32 on stdin,
//       writes N little-endian float32 scores on stdout.
//   score_client HOST PORT score_base_sensor|score_sap_sensor|
//                          score_nap_sensor N H W
//       raw-sensor ops (ScoreServer.SENSOR_OPS): the robot host ships
//       NATIVE payloads and the SERVER normalizes + fuses + scores — no
//       fusion convs client-side and 4x fewer image bytes on the wire
//       than fp32 fused windows.  stdin carries the four modality
//       segments concatenated in wire order (score_server._SENSOR_FIELDS):
//         rgb   N*3*H*W uint8        depth N*1*H*W uint8
//         force N*1 little-endian f32   mic N*1*13 little-endian f32
//       and stdout gets N little-endian float32 scores.
//
// Exit codes: 0 ok, 1 usage, 2 connect/IO failure, 3 server-side error
// (message on stderr).
//
// Build: g++ -O3 -std=c++17 native/score_client.cpp -o native/score_client

#include <arpa/inet.h>
#include <netdb.h>
#include <sys/socket.h>
#include <unistd.h>

#include <cstdint>
#include <cstdio>
#include <cstring>
#include <string>
#include <vector>

namespace {

bool read_exact(int fd, char* buf, size_t n) {
  size_t got = 0;
  while (got < n) {
    ssize_t r = read(fd, buf + got, n - got);
    if (r <= 0) return false;
    got += static_cast<size_t>(r);
  }
  return true;
}

bool write_all(int fd, const char* buf, size_t n) {
  size_t put = 0;
  while (put < n) {
    ssize_t w = write(fd, buf + put, n - put);
    if (w <= 0) return false;
    put += static_cast<size_t>(w);
  }
  return true;
}

bool send_frame(int fd, const std::string& header, const char* payload,
                size_t payload_len) {
  std::string head = header + "\n";
  // refuse frames above the server's 1 GiB ceiling BEFORE encoding: the
  // uint32 length prefix would silently wrap for >= 4 GiB payloads and
  // desync the stream into garbage frames
  if (head.size() + payload_len > (1u << 30)) return false;
  uint32_t len = htonl(static_cast<uint32_t>(head.size() + payload_len));
  return write_all(fd, reinterpret_cast<const char*>(&len), 4) &&
         write_all(fd, head.data(), head.size()) &&
         (payload_len == 0 || write_all(fd, payload, payload_len));
}

// Receives one frame; splits at the first newline into header JSON and
// payload bytes.  Returns false on transport failure.
bool recv_frame(int fd, std::string* header, std::vector<char>* payload) {
  uint32_t be_len = 0;
  if (!read_exact(fd, reinterpret_cast<char*>(&be_len), 4)) return false;
  uint32_t len = ntohl(be_len);
  if (len > (1u << 30)) return false;  // server's 1 GiB frame ceiling
  std::vector<char> blob(len);
  if (!read_exact(fd, blob.data(), len)) return false;
  const char* nl = static_cast<const char*>(memchr(blob.data(), '\n', len));
  size_t head_len = nl ? static_cast<size_t>(nl - blob.data()) : len;
  header->assign(blob.data(), head_len);
  payload->clear();
  if (nl) payload->assign(nl + 1, static_cast<const char*>(blob.data()) + len);
  return true;
}

// Minimal header checks — the server emits json.dumps output, so the
// literal substrings below are stable ("ok": true / "error": "...").
bool header_ok(const std::string& h) {
  return h.find("\"ok\": true") != std::string::npos;
}

std::string header_error(const std::string& h) {
  size_t at = h.find("\"error\": \"");
  if (at == std::string::npos) return "unknown server error: " + h;
  at += 10;
  size_t end = at;
  while (end < h.size() && !(h[end] == '"' && h[end - 1] != '\\')) end++;
  return h.substr(at, end - at);
}

int dial(const char* host, const char* port) {
  addrinfo hints{}, *res = nullptr;
  hints.ai_family = AF_UNSPEC;
  hints.ai_socktype = SOCK_STREAM;
  if (getaddrinfo(host, port, &hints, &res) != 0) return -1;
  int fd = -1;
  for (addrinfo* p = res; p; p = p->ai_next) {
    fd = socket(p->ai_family, p->ai_socktype, p->ai_protocol);
    if (fd < 0) continue;
    if (connect(fd, p->ai_addr, p->ai_addrlen) == 0) break;
    close(fd);
    fd = -1;
  }
  freeaddrinfo(res);
  return fd;
}

bool is_sensor_op(const std::string& op) {
  return op.size() > 7 && op.compare(op.size() - 7, 7, "_sensor") == 0;
}

}  // namespace

int main(int argc, char** argv) {
  if (argc < 4 || argc > 7) {
    fprintf(stderr,
            "usage: %s HOST PORT info\n"
            "       %s HOST PORT score_base|score_sap|score_nap N D "
            "(N*D f32 on stdin -> N f32 on stdout)\n"
            "       %s HOST PORT score_{base,sap,nap}_sensor N H W "
            "(u8 rgb+depth, f32 force+mic on stdin -> N f32 on stdout)\n",
            argv[0], argv[0], argv[0]);
    return 1;
  }
  const char* host = argv[1];
  const char* port = argv[2];
  const std::string op = argv[3];
  // arity must match the op: a score op at argc==4 would read
  // argv[4]==NULL below, info takes no N/D, and sensor ops need H W
  if (op == "info" && argc != 4) {
    fprintf(stderr, "score_client: info takes no N D arguments\n");
    return 1;
  }
  if (is_sensor_op(op) && argc != 7) {
    fprintf(stderr, "score_client: %s needs N H W\n", op.c_str());
    return 1;
  }
  if (op != "info" && !is_sensor_op(op) && argc != 6) {
    fprintf(stderr, "score_client: %s needs N and D\n", op.c_str());
    return 1;
  }

  int fd = dial(host, port);
  if (fd < 0) {
    fprintf(stderr, "score_client: cannot connect to %s:%s\n", host, port);
    return 2;
  }

  std::string header;
  std::vector<char> payload;
  if (op == "info") {
    if (!send_frame(fd, "{\"op\": \"info\"}", nullptr, 0) ||
        !recv_frame(fd, &header, &payload)) {
      fprintf(stderr, "score_client: transport failure\n");
      close(fd);
      return 2;
    }
    close(fd);
    if (!header_ok(header)) {
      fprintf(stderr, "score_client: %s\n", header_error(header).c_str());
      return 3;
    }
    printf("%s\n", header.c_str());
    return 0;
  }

  long n = strtol(argv[4], nullptr, 10);
  long d = strtol(argv[5], nullptr, 10);  // D for window ops, H for sensor
  long w = is_sensor_op(op) ? strtol(argv[6], nullptr, 10) : 1;
  if (n <= 0 || d <= 0 || w <= 0) {
    fprintf(stderr, "score_client: %s must be positive\n",
            is_sensor_op(op) ? "N, H and W" : "N and D");
    close(fd);
    return 1;
  }
  // size math in uint64_t BEFORE any size_t cast: on 32-bit size_t hosts
  // (robot-side ARM builds) n*d*4 can wrap to a small value and slip under
  // the ceiling — the server would still reject the payload-length
  // mismatch, but the client-side guard must catch it here.
  // Sensor payload = rgb n*3*H*W u8 + depth n*1*H*W u8 + force n*1 f32
  // + mic n*1*13 f32, in that wire order (_SENSOR_FIELDS).
  const uint64_t bytes64 =
      is_sensor_op(op)
          ? static_cast<uint64_t>(n) *
                (4 * static_cast<uint64_t>(d) * static_cast<uint64_t>(w) +
                 4 + 13 * 4)
          : static_cast<uint64_t>(n) * static_cast<uint64_t>(d) * 4;
  if (bytes64 + 200 > (1ull << 30)) {  // header headroom under the ceiling
    fprintf(stderr,
            "score_client: %llu payload bytes exceed the server's 1 GiB "
            "frame ceiling; split the request\n",
            static_cast<unsigned long long>(bytes64));
    close(fd);
    return 1;
  }
  const size_t bytes = static_cast<size_t>(bytes64);
  std::vector<char> rows(bytes);
  if (!read_exact(STDIN_FILENO, rows.data(), bytes)) {
    fprintf(stderr, "score_client: expected %zu payload bytes on stdin\n",
            bytes);
    close(fd);
    return 1;
  }

  char head[320];
  if (is_sensor_op(op)) {
    snprintf(head, sizeof(head),
             "{\"op\": \"%s\", \"sensor_shapes\": {"
             "\"r\": [%ld, 3, %ld, %ld], \"d\": [%ld, 1, %ld, %ld], "
             "\"t\": [%ld, 1], \"m\": [%ld, 1, 13]}}",
             op.c_str(), n, d, w, n, d, w, n, n);
  } else {
    snprintf(
        head, sizeof(head),
        "{\"op\": \"%s\", \"shape\": [%ld, %ld], \"dtype\": \"float32\"}",
        op.c_str(), n, d);
  }
  if (!send_frame(fd, head, rows.data(), bytes) ||
      !recv_frame(fd, &header, &payload)) {
    fprintf(stderr, "score_client: transport failure\n");
    close(fd);
    return 2;
  }
  close(fd);
  if (!header_ok(header)) {
    fprintf(stderr, "score_client: %s\n", header_error(header).c_str());
    return 3;
  }
  if (payload.size() != static_cast<size_t>(n) * 4) {
    fprintf(stderr, "score_client: expected %ld scores, got %zu bytes\n",
            n, payload.size());
    return 2;
  }
  if (!write_all(STDOUT_FILENO, payload.data(), payload.size())) return 2;
  return 0;
}
