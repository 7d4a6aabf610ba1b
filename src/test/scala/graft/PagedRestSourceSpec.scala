package graft

import org.apache.spark.sql.functions._
import graft.sources.PagedRestSource

/** S1/S4 via DataSourceV2: page-per-partition parallelism and GT-cursor
  * pushdown pruning pages before any "fetch". */
class PagedRestSourceSpec extends SparkSpec {

  private def read() = spark.read
    .format("graft.sources.PagedRestSource")
    .option("pages", "10").option("pageSize", "100")
    .load()

  test("full scan yields pages x pageSize rows across page partitions") {
    val df = read()
    assert(df.count() === 1000)
    assert(PagedRestSource.lastPlannedPages.get() === 10)
    assert(df.rdd.getNumPartitions === 10) // one partition per REST page
  }

  test("cursor predicate pushes into the source and prunes whole pages (S4)") {
    // records advance 1 min from 2024-01-01T00:00Z; cursor at +700 min
    // leaves 299 newer records spanning pages 7..9
    val cursor = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(700 * 60))
    val df = read().filter(col("updated_at") > lit(cursor))
    assert(df.count() === 299)
    assert(PagedRestSource.lastPlannedPages.get() === 3,
      "pages wholly below the cursor must never be fetched")
    val plan = df.queryExecution.explainString(
      org.apache.spark.sql.execution.ExplainMode.fromString("formatted"))
    assert(plan.contains("PushedCursorFilter"),
      s"plan should surface the pushed cursor filter:\n$plan")
  }

  test("cursor semantics match the reference's strict GT (no replay of the boundary row)") {
    val boundary = java.sql.Timestamp.from(
      java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(999 * 60))
    val df = read().filter(col("updated_at") > lit(boundary))
    assert(df.count() === 0) // last record is exactly at the boundary
  }

  test("real-HTTP pagination over a loopback server, pushdown skipping unfetched pages") {
    // a 127.0.0.1 HttpServer serving the reference's page shape
    // (`after` cursor token + limit-sized `results` pages — the
    // hubspotoop.py:50-83 contract) exercises the egress seam without
    // leaving the machine: the reader must paginate over real HTTP,
    // match the synthetic generator row-for-row, and — under a pushed
    // GT-cursor — never REQUEST a page wholly below the cursor.
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/objects", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val params = ex.getRequestURI.getQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val after = params("after").toLong
        val limit = params("limit").toInt
        hits.add(after)
        val results = (0 until limit).map { i =>
          val id = after + i
          val us = PagedRestSource.T0Micros + id * PagedRestSource.StepMicros
          val inst = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
          s"""{"id":"$id","updatedAt":"$inst","payload":"{\\"seq\\": $id}"}"""
        }.mkString("[", ",", "]")
        val body = s"""{"results":$results,"paging":{"next":{"after":"${after + limit}"}}}"""
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/objects"
      def httpRead() = spark.read
        .format("graft.sources.PagedRestSource")
        .option("pages", "10").option("pageSize", "100")
        .option("endpoint", endpoint)
        .load()

      // parity: the HTTP path must produce exactly the synthetic rows
      val overWire = httpRead().collect().map(_.toSeq).toSet
      assert(overWire === read().collect().map(_.toSeq).toSet)
      assert(hits.size === 10, "full scan must fetch every page exactly once")

      // pushdown: pages wholly below the cursor are never requested
      hits.clear()
      val cursor = java.sql.Timestamp.from(
        java.time.Instant.parse("2024-01-01T00:00:00Z").plusSeconds(700 * 60))
      val df = httpRead().filter(col("updated_at") > lit(cursor))
      assert(df.count() === 299)
      val requested = {
        val it = hits.iterator(); val b = Set.newBuilder[Long]
        while (it.hasNext) b += it.next(); b.result()
      }
      assert(requested === Set(700L, 800L, 900L),
        s"only the pages past the cursor may hit the server, got $requested")
    } finally server.stop(0)
  }

  test("transient HTTP failures retry inside the partition (reference backoff)") {
    // every page's FIRST request 503s; the reader's in-partition backoff
    // (the reference's retry.py discipline) must absorb it without
    // surfacing a task failure or losing rows
    val seen = java.util.concurrent.ConcurrentHashMap.newKeySet[Long]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/objects", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val params = ex.getRequestURI.getQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val after = params("after").toLong
        if (seen.add(after)) {
          ex.sendResponseHeaders(503, -1)
          ex.close()
          return
        }
        val limit = params("limit").toInt
        val results = (0 until limit).map { i =>
          val id = after + i
          val us = PagedRestSource.T0Micros + id * PagedRestSource.StepMicros
          val inst = java.time.Instant.ofEpochSecond(us / 1000000L, (us % 1000000L) * 1000L)
          s"""{"id":"$id","updatedAt":"$inst","payload":"{\\"seq\\": $id}"}"""
        }.mkString("[", ",", "]")
        val body = s"""{"results":$results,"paging":{"next":{"after":"${after + limit}"}}}"""
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/objects"
      val df = spark.read
        .format("graft.sources.PagedRestSource")
        .option("pages", "3").option("pageSize", "50")
        .option("endpoint", endpoint)
        .load()
      assert(df.count() === 150, "all rows arrive despite each page 503ing once")
    } finally server.stop(0)
  }
}
