package graft.sources

/** Config-driven connection setup (feeder.py:14-20 reads `config.json`
  * with api token, project name, and database coordinates). Parsed into
  * a typed config that yields the derived connection artifacts: the API
  * header map (feeder.py:16) and the JDBC url/options for
  * [[JdbcFeed]] (feeder.py:130-134's psycopg2.connect).
  *
  * Minimal flat-JSON parsing on purpose — the config is a handful of
  * scalar fields and this keeps the library dependency-free.
  */
final case class FeedConfig(
    apiToken: String,
    projectName: String,
    dbHost: String,
    dbName: String,
    dbUser: String,
    dbPassword: String) {

  /** Request headers the API crawl sends (feeder.py:16). */
  def apiHeaders: Map[String, String] = Map(
    "SS-Token" -> apiToken,
    "Content-type" -> "application/json",
  )

  def jdbcUrl: String = s"jdbc:postgresql://$dbHost/$dbName"

  /** Options for spark.read/write.format("jdbc"). */
  def jdbcOptions: Map[String, String] = Map(
    "url" -> jdbcUrl,
    "user" -> dbUser,
    "password" -> dbPassword,
  )

  /** Trailing-two-character wave derivation (feeder.py:124-125). */
  def waveNumber: String = projectName.takeRight(2)
}

object FeedConfig {

  /** Parse the reference's flat config.json shape. */
  def fromJson(json: String): FeedConfig = {
    def field(name: String): String = {
      val m = ("\"" + java.util.regex.Pattern.quote(name) +
        "\"\\s*:\\s*\"((?:[^\"\\\\]|\\\\.)*)\"").r
      m.findFirstMatchIn(json)
        .getOrElse(throw new IllegalArgumentException(s"missing config field: $name"))
        .group(1)
        .replace("\\\"", "\"").replace("\\\\", "\\")
    }
    FeedConfig(
      apiToken = field("api_token"),
      projectName = field("project_name"),
      dbHost = field("db_host"),
      dbName = field("db_name"),
      dbUser = field("db_user"),
      dbPassword = field("db_password"))
  }

  def fromFile(path: String): FeedConfig =
    fromJson(new String(java.nio.file.Files.readAllBytes(
      java.nio.file.Paths.get(path)), java.nio.charset.StandardCharsets.UTF_8))
}
