package graft.logs

import org.scalatest.funsuite.AnyFunSuite

/** Config surface of the runnable service (cmd/server/main.go:24-30):
  * HTTP_ADDR in the reference's `host:port` / `:port` forms, falling back
  * to loopback + HTTP_PORT. */
class LogServiceMainSpec extends AnyFunSuite {

  test("HTTP_ADDR host:port and :port forms") {
    assert(LogServiceMain.bindAddress(Map("HTTP_ADDR" -> "10.0.0.5:9090")) ==
      (("10.0.0.5", 9090)))
    // Go's net.Listen on ":8080" binds all interfaces
    assert(LogServiceMain.bindAddress(Map("HTTP_ADDR" -> ":8080")) ==
      (("0.0.0.0", 8080)))
  }

  test("fallback: loopback + HTTP_PORT, default 8080") {
    assert(LogServiceMain.bindAddress(Map("HTTP_PORT" -> "9999")) ==
      (("127.0.0.1", 9999)))
    assert(LogServiceMain.bindAddress(Map.empty) == (("127.0.0.1", 8080)))
    // empty HTTP_ADDR is treated as absent, not a parse error
    assert(LogServiceMain.bindAddress(Map("HTTP_ADDR" -> "")) ==
      (("127.0.0.1", 8080)))
  }

  test("malformed HTTP_ADDR fails loudly") {
    intercept[IllegalArgumentException](
      LogServiceMain.bindAddress(Map("HTTP_ADDR" -> "no-port-here")))
  }

  test("GRPC_ADDR parses like the reference; default :8081 → loopback") {
    assert(LogServiceMain.grpcAddress(Map("GRPC_ADDR" -> ":9095")) ==
      (("0.0.0.0", 9095)))
    assert(LogServiceMain.grpcAddress(Map.empty) == (("127.0.0.1", 8081)))
  }
}
