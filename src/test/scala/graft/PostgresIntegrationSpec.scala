package graft

import graft.sources.IO
import org.apache.spark.sql.SaveMode
import org.apache.spark.sql.functions._

/** Real-Postgres integration — the ONE environment-bound gap of the JDBC
  * surface (everything else runs against embedded Derby, [[JdbcSpec]]).
  * This spec is CONFIG-GATED: it runs only when `SPARK_GRAFT_PG_URL` is
  * set (plus optional `SPARK_GRAFT_PG_USER` / `SPARK_GRAFT_PG_PASSWORD`,
  * both defaulting to `postgres`) and cancels cleanly otherwise — no
  * Postgres exists in the build sandbox.
  *
  *   SPARK_GRAFT_PG_URL=jdbc:postgresql://localhost:5432/graft \
  *     sbt "testOnly graft.PostgresIntegrationSpec"
  *
  * What it proves end-to-end against a real instance: the reference's
  * schema surface (`database and queries aupostgres.sql:1-77` — tables,
  * PK/FK/UNIQUE/CHECK constraints, the audit trigger) installs verbatim-
  * equivalent DDL; Spark's batched JDBC writer seeds it; the partitioned
  * JDBC reader scans it back; and the reference's author-productivity
  * report computed IN SPARK equals the same SQL computed IN POSTGRES.
  */
class PostgresIntegrationSpec extends SparkSpec {
  import spark.implicits._

  private val pgUrl = sys.env.get("SPARK_GRAFT_PG_URL")
  private def cfg = IO.JdbcConfig(
    url = pgUrl.get,
    user = sys.env.getOrElse("SPARK_GRAFT_PG_USER", "postgres"),
    password = sys.env.getOrElse("SPARK_GRAFT_PG_PASSWORD", "postgres"))

  /** The reference DDL, normalized (semantics-identical: same tables,
    * columns, constraints, trigger; reference file cited above).
    */
  private val ddl: Seq[String] = Seq(
    """CREATE TABLE publications (
      |  id SERIAL PRIMARY KEY,
      |  submitter VARCHAR(255) NOT NULL,
      |  title TEXT NOT NULL CHECK (title <> '' AND char_length(title) > 1),
      |  comments TEXT, journal_ref VARCHAR(255),
      |  doi VARCHAR(255) UNIQUE, report_no VARCHAR(255) UNIQUE,
      |  categories VARCHAR(255), license VARCHAR(255), abstract TEXT,
      |  publication_type VARCHAR(255), update_date DATE)""".stripMargin,
    "ALTER TABLE publications ADD CONSTRAINT unique_title UNIQUE (title)",
    """CREATE TABLE citations (
      |  id SERIAL PRIMARY KEY, publication_id INT NOT NULL,
      |  title TEXT NOT NULL, author VARCHAR(255), year INT,
      |  FOREIGN KEY (publication_id) REFERENCES publications(id))""".stripMargin,
    """CREATE TABLE authors (
      |  id SERIAL PRIMARY KEY,
      |  name VARCHAR(255) NOT NULL CHECK (name <> ''),
      |  affiliation VARCHAR(255) NOT NULL CHECK (affiliation <> ''))""".stripMargin,
    """CREATE TABLE publication_venues (
      |  id SERIAL PRIMARY KEY,
      |  name VARCHAR(255) NOT NULL CHECK (name <> ''),
      |  impact_factor FLOAT CHECK (impact_factor >= 0))""".stripMargin,
    """CREATE TABLE categories (
      |  id SERIAL PRIMARY KEY,
      |  category_name VARCHAR(255) NOT NULL CHECK (category_name <> ''))""".stripMargin,
    """CREATE TABLE authorship (
      |  publication_id INT NOT NULL, author_id INT NOT NULL,
      |  PRIMARY KEY (publication_id, author_id),
      |  FOREIGN KEY (publication_id) REFERENCES publications(id),
      |  FOREIGN KEY (author_id) REFERENCES authors(id))""".stripMargin,
    """CREATE TABLE publication_category (
      |  publication_id INT NOT NULL, category_id INT NOT NULL,
      |  PRIMARY KEY (publication_id, category_id),
      |  FOREIGN KEY (publication_id) REFERENCES publications(id),
      |  FOREIGN KEY (category_id) REFERENCES categories(id))""".stripMargin,
    """CREATE TABLE log_table (
      |  log_id SERIAL PRIMARY KEY,
      |  table_name VARCHAR(255) NOT NULL, operation VARCHAR(50) NOT NULL,
      |  old_values TEXT, new_values TEXT,
      |  operation_time TIMESTAMP NOT NULL DEFAULT CURRENT_TIMESTAMP)""".stripMargin,
    """CREATE OR REPLACE FUNCTION log_publication_changes()
      |RETURNS TRIGGER AS $$
      |BEGIN
      |  INSERT INTO log_table (table_name, operation, old_values, new_values, operation_time)
      |  VALUES ('publications', TG_OP, row_to_json(OLD), row_to_json(NEW), CURRENT_TIMESTAMP);
      |  RETURN NEW;
      |END;
      |$$ LANGUAGE plpgsql""".stripMargin,
    """CREATE TRIGGER trg_log_publications
      |AFTER INSERT OR UPDATE OR DELETE ON publications
      |FOR EACH ROW EXECUTE FUNCTION log_publication_changes()""".stripMargin)

  private val allTables = Seq("log_table", "publication_category",
    "authorship", "citations", "publication_venues", "categories",
    "authors", "publications")

  private def withConn[A](f: java.sql.Connection => A): A = {
    val c = java.sql.DriverManager.getConnection(
      cfg.url, cfg.user, cfg.password)
    try f(c) finally c.close()
  }

  test("reference DDL installs, Spark JDBC seeds it, Spark report ≡ Postgres report") {
    assume(pgUrl.isDefined,
      "SPARK_GRAFT_PG_URL not set — skipping real-Postgres integration")
    withConn { c =>
      val st = c.createStatement()
      st.execute("DROP TRIGGER IF EXISTS trg_log_publications ON publications")
      allTables.foreach(t => st.execute(s"DROP TABLE IF EXISTS $t CASCADE"))
      ddl.foreach(st.execute)
      st.close()
    }
    // seed through Spark's batched JDBC writer (append: the DDL owns the
    // schema; overwrite would replace it with Spark-inferred types)
    val pubs = Seq(
      (1, "alice", "Deep Parquet Pruning", "2024-01-01"),
      (2, "bob", "Shuffle-Free Joins", "2024-02-01"),
      (3, "carol", "Bloom Gated Ingest", "2024-03-01"))
      .toDF("id", "submitter", "title", "update_date")
      .withColumn("update_date", to_date($"update_date"))
    val authors = Seq((1, "Ada", "MIT"), (2, "Grace", "Navy"))
      .toDF("id", "name", "affiliation")
    val authorship = Seq((1, 1), (2, 1), (3, 2), (1, 2))
      .toDF("publication_id", "author_id")
    IO.writeJdbc(pubs, cfg, "publications", SaveMode.Append)
    IO.writeJdbc(authors, cfg, "authors", SaveMode.Append)
    IO.writeJdbc(authorship, cfg, "authorship", SaveMode.Append)
    // the audit trigger fired per INSERT on publications
    val logged = withConn { c =>
      val rs = c.createStatement().executeQuery(
        "SELECT count(*) FROM log_table WHERE operation = 'INSERT'")
      rs.next(); rs.getLong(1)
    }
    assert(logged == 3L, s"audit trigger logged $logged of 3 inserts")
    // the reference's author-productivity report, computed in Spark over
    // the partitioned JDBC scan...
    val sparkReport = IO.readJdbc(spark, cfg, "authors",
        partitionColumn = Some("id"), lowerBound = 1, upperBound = 3,
        numPartitions = 2)
      .join(IO.readJdbc(spark, cfg, "authorship"), $"id" === $"author_id")
      .groupBy($"id", $"name")
      .agg(count($"publication_id").as("publication_count"))
      .select($"id".cast("long"), $"name", $"publication_count")
      .as[(Long, String, Long)].collect().toSet
    // ...equals the same SQL computed by Postgres itself
    val pgReport = withConn { c =>
      val rs = c.createStatement().executeQuery(
        """SELECT a.id, a.name, COUNT(ap.publication_id) AS publication_count
          |FROM authors a JOIN authorship ap ON a.id = ap.author_id
          |GROUP BY a.id, a.name""".stripMargin)
      val buf = scala.collection.mutable.Set.empty[(Long, String, Long)]
      while (rs.next()) buf += ((rs.getLong(1), rs.getString(2), rs.getLong(3)))
      buf.toSet
    }
    assert(sparkReport == pgReport && sparkReport.nonEmpty)
  }
}
