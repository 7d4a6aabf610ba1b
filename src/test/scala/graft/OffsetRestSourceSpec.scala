package graft

import graft.sources.OffsetRestSource

/** DSv2 offset-pagination source: parallel windows + LIMIT pushdown. */
class OffsetRestSourceSpec extends SparkSpec {

  private def read(pages: Int = 10, pageSize: Int = 100) =
    spark.read.format("graft.sources.OffsetRestSource")
      .option("pages", pages).option("pageSize", pageSize).load()

  test("full scan plans every window and yields pages*pageSize rows") {
    val df = read()
    assert(df.count() === 1000L)
    assert(OffsetRestSource.lastPlannedPages.get() === 10)
  }

  test("LIMIT pushdown plans only ceil(limit/pageSize) windows") {
    val out = read().limit(150).collect()
    assert(out.length === 150)
    assert(OffsetRestSource.lastPlannedPages.get() === 2,
      "limit 150 over 100-row pages must plan exactly 2 windows")
    // ids are the offset sequence, so the limit trims exactly
    assert(out.map(_.getLong(0)).min === 0L)
  }

  test("windows partition the id space without overlap") {
    val ids = read(pages = 4, pageSize = 50).collect().map(_.getLong(0)).sorted
    assert(ids.toSeq === (0L until 200L).toSeq)
  }

  test("real-HTTP offset windows over loopback; pushed LIMIT never requests extra windows") {
    // the loopback analog of the reference's offset/limit list endpoint
    // (hubspotoop.py:350-383): the reader must fetch each window over
    // real HTTP, match the synthetic rows, and — under a pushed LIMIT —
    // never request offsets past the needed windows
    val hits = new java.util.concurrent.ConcurrentLinkedQueue[Long]()
    val server = com.sun.net.httpserver.HttpServer.create(
      new java.net.InetSocketAddress("127.0.0.1", 0), 0)
    server.createContext("/list", new com.sun.net.httpserver.HttpHandler {
      override def handle(ex: com.sun.net.httpserver.HttpExchange): Unit = {
        val params = ex.getRequestURI.getQuery.split("&")
          .map(_.split("=", 2)).map(a => a(0) -> a(1)).toMap
        val offset = params("offset").toLong
        val limit = params("limit").toInt
        hits.add(offset)
        val results = (0 until limit)
          .map(i => s"""{"id":"${offset + i}","name":"record_${offset + i}"}""")
          .mkString("[", ",", "]")
        val body = s"""{"results":$results,"has-more":${offset + limit < 1000}}"""
        val bytes = body.getBytes("UTF-8")
        ex.sendResponseHeaders(200, bytes.length)
        val os = ex.getResponseBody
        try os.write(bytes) finally os.close()
      }
    })
    server.start()
    try {
      val endpoint = s"http://127.0.0.1:${server.getAddress.getPort}/list"
      def httpRead() = spark.read.format("graft.sources.OffsetRestSource")
        .option("pages", "10").option("pageSize", "100")
        .option("endpoint", endpoint).load()

      assert(httpRead().collect().map(_.toSeq).toSet
        === read().collect().map(_.toSeq).toSet)
      assert(hits.size === 10)

      hits.clear()
      assert(httpRead().limit(150).collect().length === 150)
      val requested = {
        val it = hits.iterator(); val b = Set.newBuilder[Long]
        while (it.hasNext) b += it.next(); b.result()
      }
      assert(requested === Set(0L, 100L),
        s"limit 150 must request exactly the first two windows, got $requested")
    } finally server.stop(0)
  }
}
